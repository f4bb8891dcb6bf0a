"""pandas-compatible frontend facade (the legate.pandas API surface, SURVEY §2)
compiled to lazy PySpark DataFrame plans."""

from legate_pandas_spark.frontend.frame import DataFrame, concat, from_pandas  # noqa: F401
from legate_pandas_spark.frontend.series import Series  # noqa: F401
from legate_pandas_spark.frontend.io import read_csv, read_json, read_orc, read_parquet  # noqa: F401
from legate_pandas_spark.frontend.query import translate_query_expr  # noqa: F401
from legate_pandas_spark.frontend.encode import crosstab, cut, get_dummies, pivot_table, qcut  # noqa: F401


def merge_asof(left, right, on, by, tolerance_seconds=None):
    """pandas.merge_asof (backward) on the facade: latest right row at-or-before
    each left row per `by` group. Union + forward-fill technique (see
    operators/asof.py) — one shuffle, no range blowup."""
    from legate_pandas_spark.operators.asof import asof_join

    value_cols = [c for c in right.columns if c not in (on, by)]
    out = asof_join(
        left._sdf.select(*left.columns),
        right._sdf.select(*right.columns),
        on=on,
        by=by,
        right_value_cols=value_cols,
        tolerance_seconds=tolerance_seconds,
    )
    return DataFrame(out)


def to_datetime(s, format: str | None = None):
    """Module-level pandas.to_datetime for Series (delegates to the Series'
    string→timestamp cast with strftime-format translation)."""
    return s.to_datetime(format)


def to_numeric(s, errors: str = "raise"):
    """Module-level pandas.to_numeric: cast to double; ``errors='coerce'``
    nulls unparseable values (try_cast), ``'raise'`` surfaces them via the
    ANSI cast."""
    import pyspark.sql.functions as F  # noqa: F401

    if errors == "coerce":
        return s._wrap(s._col.try_cast("double"))
    return s.astype("float64")


def merge(left, right, **kwargs):
    """Module-level pandas.merge (same as DataFrame.merge)."""
    return left.merge(right, **kwargs)


def factorize(s, sort: bool = False):
    """Module-level pandas.factorize for Series — see ``Series.factorize``."""
    return s.factorize(sort=sort)


def isna(obj):
    """Module-level pandas.isna for Series (element-wise null mask)."""
    return obj.isna()


def notna(obj):
    """Module-level pandas.notna."""
    return obj.notna()


def date_range(start, end=None, periods=None, freq: str = "D"):
    """pandas.date_range returning a plain Python list of pandas Timestamps
    (driver-side spine; pair with a spine DataFrame + explode for the
    distributed gap-fill pattern — see the date_spine_gap_fill operator)."""
    import pandas as pd

    return list(pd.date_range(start=start, end=end, periods=periods, freq=freq))


def wide_to_long(df, stubnames, i, j, sep: str = "", suffix: str = r"\d+"):
    """pandas.wide_to_long: unpivot column families ``{stub}{sep}{suffix}``
    into long format — one row per (record, suffix), one value column per
    stub, indexed by ``i + [j]``. Missing stub/suffix combinations become
    null; non-stub extra columns are carried through; duplicate ``i`` keys
    raise like pandas. Compiles to ONE ``stack`` expression (narrow,
    shuffle-free — the same plan shape as melt); the only action is the
    pandas-mandated uniqueness check on ``i`` (one aggregate). Row order is
    not part of the contract (unordered-frame discipline; sort after).

    Reference has no reshape family — beyond-reference breadth
    (SURVEY §2.7 ext)."""
    import re

    import pyspark.sql.functions as F

    stubs = [stubnames] if isinstance(stubnames, str) else list(stubnames)
    ids = [i] if isinstance(i, str) else list(i)
    pats = {
        stub: re.compile(
            "^" + re.escape(stub) + re.escape(sep) + "(" + suffix + ")$"
        )
        for stub in stubs
    }
    suffixes: list[str] = []
    stub_cols: dict = {stub: {} for stub in stubs}
    for c in df.columns:
        for stub in stubs:
            m = pats[stub].match(c)
            if m:
                s = m.group(1)
                if s not in suffixes:
                    suffixes.append(s)
                stub_cols[stub][s] = c
                break
    if not suffixes:
        raise ValueError(
            "stubname didn't match any column: check stubnames/sep/suffix"
        )
    matched = {c for sc in stub_cols.values() for c in sc.values()}
    extras = [c for c in df.columns if c not in ids and c not in matched]
    # pandas contract: i must uniquely identify rows (one aggregate action)
    dup = (
        df._sdf.groupBy(*ids)
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError("the id variables need to uniquely identify each row")
    dtypes = dict(df._sdf.dtypes)
    rows = []
    for s in suffixes:
        items = [f"'{s}'"]
        for stub in stubs:
            c = stub_cols[stub].get(s)
            if c is not None:
                items.append(f"`{c}`")
            else:  # typed null so stack's per-column types stay consistent
                # a stub matching NO column at all is all-null double (pandas)
                any_c = next(iter(stub_cols[stub].values()), None)
                items.append(
                    f"CAST(NULL AS {dtypes[any_c] if any_c else 'double'})"
                )
        rows.append(", ".join(items))
    stub_out = ", ".join(f"`{s}`" for s in stubs)
    stacked = F.expr(
        f"stack({len(suffixes)}, {', '.join(rows)}) as (`{j}`, {stub_out})"
    )
    out = df._sdf.select(*ids, *extras, stacked)
    if all(re.fullmatch(r"\d+", s) for s in suffixes):
        out = out.withColumn(j, F.col(j).cast("long"))  # pandas int j
    return DataFrame(out, tuple(ids + [j]))


def json_normalize(data, record_path=None, meta=None, sep: str = ".", spark=None):
    """pandas.json_normalize: flatten driver-side JSON-like objects (dict /
    list of dicts) into a distributed DataFrame. The normalization itself is
    pandas' (the input is driver-resident Python data by definition of this
    API — there is nothing to distribute until a frame exists); the result
    is immediately promoted to a distributed frame. For normalizing a JSON
    STRING COLUMN at scale, use the json_extract_props / json_schema
    operators (from_json + field projection — fully distributed)."""
    import pandas as pd

    pdf = pd.json_normalize(data, record_path=record_path, meta=meta, sep=sep)
    return from_pandas(pdf, spark=spark)
