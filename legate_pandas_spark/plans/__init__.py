from legate_pandas_spark.plans.inspect import (  # noqa: F401
    explain_text,
    scan_read_schema,
    pushed_filters,
    assert_no_cartesian,
)
