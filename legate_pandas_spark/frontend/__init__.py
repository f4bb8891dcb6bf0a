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
