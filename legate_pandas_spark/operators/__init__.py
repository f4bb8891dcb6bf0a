"""Named-query catalog.

Every module registers queries into a shared registry via the ``@query`` decorator:
``QUERIES[name] -> (spark, sf_dir) -> DataFrame`` and (where SQL-expressible)
``ORACLES[name] -> DuckDB SQL string``. ``__spark_entry__.py`` re-exports both dicts
for the correctness driver; tests and bench.py iterate the same registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query; ``oracle`` is the equivalent DuckDB SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so the registry is fully populated."""
    from legate_pandas_spark.operators import (  # noqa: F401
        relational,
        subqueries,
        mlstats,
        asof,
        windows,
        dedup,
        similarity,
        textops,
        curation,
        multimodal,
        frontend_queries,
    )
