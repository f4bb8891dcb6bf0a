"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the operator catalog in
``legate_pandas_spark.operators`` (relational, window, dedup, similarity, text,
multimodal, and pandas-frontend queries — see SURVEY.md §2 for the inventory
mapping). ``entry(spark)`` runs the flagship TPC-H Q1-shaped aggregation at
sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def _registry():
    from legate_pandas_spark.operators import QUERIES, ORACLES, load_all
    from legate_pandas_spark.session import ensure_runtime_conf

    load_all()
    return QUERIES, ORACLES, ensure_runtime_conf


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries, _, ensure_runtime_conf = _registry()
    ensure_runtime_conf(spark)
    return queries["q1_pricing_summary"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry, _, ensure_runtime_conf = _registry()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_runtime_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in registry.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    _, oracles, _ = _registry()
    return dict(oracles)
