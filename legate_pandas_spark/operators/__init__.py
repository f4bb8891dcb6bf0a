"""Named-query catalog.

Every module registers queries into a shared registry via the ``@query`` decorator:
``QUERIES[name] -> (spark, sf_dir) -> DataFrame`` and (where SQL-expressible)
``ORACLES[name] -> DuckDB SQL string``. ``__spark_entry__.py`` re-exports both dicts
for the correctness driver; tests and bench.py iterate the same registry.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def outer_explode(sdf: DataFrame, arr, name: str, *keep) -> DataFrame:
    """Explode an EXPENSIVE computed array safely: ``explode_outer`` + a null
    filter on the OUTPUT column.

    With a plain inner ``explode``, Catalyst's InferFiltersFromGenerate rule
    derives ``size(arr) > 0 AND isnotnull(arr)`` and pushes it toward the scan
    — re-evaluating the whole array expression (n-gram/shingle transforms)
    per input row, sometimes below the repartition that was supposed to
    parallelize it (measured 10x slowdown on the 5-gram pipeline). The outer
    generator infers nothing; filtering the emitted column restores inner
    semantics at the cost of one null row per empty array."""
    return sdf.select(*keep, F.explode_outer(arr).alias(name)).filter(
        F.col(name).isNotNull()
    )

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Corpus-dependent oracle swaps (round-11, ADVICE r10): a query whose PLAN is
# picked by a corpus probe (e.g. dedup_embedding_cosine_blocked's exact→LSH
# auto-route) registers a resolver here: ``(spark, sf_dir) -> str | None``.
# None means "the static ORACLES entry is the right reference for this
# corpus"; a string replaces it. tools/oracle_check.py consults this before
# running the DuckDB side, so a routed regime is differentially GATED with
# the oracle that matches its semantics instead of hash-mismatching by
# design. The driver's own gate (sf0.01, no routing fires) never needs it.
ORACLE_OVERRIDES: dict[str, Callable[[SparkSession, str], str | None]] = {}


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
        analytics,
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
