from legate_pandas_spark.sources.tables import load_table, TABLES  # noqa: F401
