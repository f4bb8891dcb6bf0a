"""pandas-compatible frontend facade (the legate.pandas API surface, SURVEY §2)
compiled to lazy PySpark DataFrame plans."""

from legate_pandas_spark.frontend.frame import DataFrame, concat, from_pandas  # noqa: F401
from legate_pandas_spark.frontend.series import Series  # noqa: F401
from legate_pandas_spark.frontend.io import read_csv, read_parquet  # noqa: F401
from legate_pandas_spark.frontend.query import translate_query_expr  # noqa: F401
