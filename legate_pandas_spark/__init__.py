"""legate_pandas_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of nv-legate/legate.pandas.

Built Spark-first: the pandas-style frontend (``DataFrame``/``Series``/``read_csv``/
``read_parquet``) compiles to lazy PySpark DataFrame plans so Catalyst/Tungsten pick
the physical strategy; the ``operators`` package is a catalog of named analytic
queries (relational, window, dedup, similarity, text) used by the correctness and
bench harnesses.

Reference parity: see SURVEY.md §2 (operator inventory, with reference file:line
citations) — this package re-expresses those semantics on Spark primitives; it does
not port the reference's Legion/cuDF execution machinery.
"""

from legate_pandas_spark.session import get_spark  # noqa: F401
from legate_pandas_spark.frontend import (  # noqa: F401
    DataFrame,
    Series,
    concat,
    crosstab,
    cut,
    factorize,
    get_dummies,
    isna,
    notna,
    date_range,
    merge,
    merge_asof,
    pivot_table,
    qcut,
    to_datetime,
    to_numeric,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    from_pandas,
    wide_to_long,
    json_normalize,
)

__version__ = "0.1.0"
