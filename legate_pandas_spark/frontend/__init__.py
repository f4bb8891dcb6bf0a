"""pandas-compatible frontend facade (the legate.pandas API surface, SURVEY §2)
compiled to lazy PySpark DataFrame plans."""

from legate_pandas_spark.frontend.frame import DataFrame, concat, from_pandas  # noqa: F401
from legate_pandas_spark.frontend.series import Series  # noqa: F401
from legate_pandas_spark.frontend.io import read_csv, read_json, read_orc, read_parquet  # noqa: F401
from legate_pandas_spark.frontend.query import translate_query_expr  # noqa: F401
from legate_pandas_spark.frontend.encode import crosstab, cut, get_dummies, qcut  # noqa: F401


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
