"""Round-8 connected-components scale audit:

* the numpy min-label/pointer-jumping driver solver must match a reference
  union-find on random graphs (hypothesis) and on a deep-diameter path graph
  (the pointer-jumping worst case);
* the distributed large-star/small-star path (forced via the threshold
  constant) must produce the same labels;
* the LSH component edge list (rep pairs + identity-star edges) must yield
  oracle-identical components on a clone-dense corpus while staying LINEAR
  in clone mass (k star edges for a k-clique, not C(k,2)).
"""
import os
import random

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F


def _py_cc(rows):
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes = set()
    for a, b in rows:
        if a == b:
            continue
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in nodes}


def _spark_cc(spark, rows, threshold=None):
    import legate_pandas_spark.operators.dedup as D

    e = spark.createDataFrame(rows, "src long, dst long")
    if threshold is None:
        out = D.connected_components(e)
    else:
        orig = D._CC_SMALL_EDGE_THRESHOLD
        D._CC_SMALL_EDGE_THRESHOLD = threshold
        try:
            out = D.connected_components(e)
        finally:
            D._CC_SMALL_EDGE_THRESHOLD = orig
    return {r["doc_id"]: r["component_id"] for r in out.collect()}


edge_lists = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=1, max_size=120
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=edge_lists)
def test_numpy_solver_matches_union_find(spark, rows):
    assert _spark_cc(spark, rows) == _py_cc(rows)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=edge_lists)
def test_distributed_path_matches_union_find(spark, rows):
    assert _spark_cc(spark, rows, threshold=0) == _py_cc(rows)


def test_path_graph_deep_diameter(spark):
    """A 3000-node path: worst case for min-label propagation — pointer
    jumping must converge to one component with min-id labels."""
    rows = [(i, i + 1) for i in range(3000)]
    got = _spark_cc(spark, rows)
    assert set(got.values()) == {0}
    assert len(got) == 3001


def test_random_big_graph_both_paths_agree(spark):
    rnd = random.Random(11)
    rows = [(rnd.randrange(2000), rnd.randrange(2000)) for _ in range(4000)]
    assert _spark_cc(spark, rows) == _spark_cc(spark, rows, threshold=0)


def test_clone_dense_cc_matches_oracle_with_star_edges(spark, tmp_path):
    """Clone-dense corpus: components must match the DuckDB recursive-CTE
    oracle, and the solver's input edge list must be LINEAR in clone count
    (star edges), not the C(k,2) expanded pairs."""
    import duckdb

    from legate_pandas_spark.operators import ORACLES, load_all
    from legate_pandas_spark.operators.dedup import (
        _lsh_component_edges,
        dedup_connected_components,
    )

    load_all()
    clone = "the quick brown fox jumps over the lazy dog every single day"
    docs = pd.DataFrame(
        [(i, "en", clone) for i in range(50)]
        + [
            (500, "en", clone + " with a tiny suffix"),
            (600, "en", "unrelated text about catalyst planning and codegen"),
        ],
        columns=["doc_id", "lang", "text"],
    )
    p = str(tmp_path / "ccadv")
    os.makedirs(p, exist_ok=True)
    docs.to_parquet(os.path.join(p, "documents.parquet"), index=False)

    n_edges = _lsh_component_edges(spark, p).count()
    # 50-clone clique: 49 star edges + rep pairs (1-2), NOT C(50,2)=1225
    assert n_edges < 60, n_edges

    got = sorted(
        tuple(r) for r in dedup_connected_components(spark, p).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs)
    exp = sorted(con.execute(ORACLES["dedup_connected_components"]).fetchall())
    assert got == exp
