"""Round-5: the parameterized pagerank primitive — n-iteration differential
vs a DuckDB oracle whose WITH-chain is GENERATED for the same n, so any drift
in the loop/checkpoint refactor (vs the fixed 2-iteration catalog query)
surfaces immediately."""

import duckdb
import pytest


def _edge_list():
    """Deterministic bidirectional graph: 40 nodes, ring + chords — every node
    has out-edges (the primitive's documented contract)."""
    edges = set()
    n = 40
    for i in range(n):
        edges.add((i, (i + 1) % n))
        edges.add((i, (i * 7 + 3) % n))
    both = set()
    for a, b in edges:
        if a != b:
            both.add((f"n{a}", f"n{b}"))
            both.add((f"n{b}", f"n{a}"))
    return sorted(both)


def _duck_pagerank(edges, iterations, damping=0.85):
    con = duckdb.connect()
    vals = ", ".join(f"('{a}', '{b}')" for a, b in edges)
    parts = [
        f"WITH edges(src, dst) AS (VALUES {vals})",
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"m{i} AS (SELECT e.dst, sum(r{i-1}.r/deg.d) AS m FROM edges e "
            f"JOIN r{i-1} ON r{i-1}.node = e.src "
            f"JOIN deg ON deg.src = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT node, {1.0 - damping}/(SELECT n FROM nn) "
            f"+ {damping}*coalesce(m{i}.m, 0) AS r "
            f"FROM nodes LEFT JOIN m{i} ON m{i}.dst = nodes.node)"
        )
    sql = (
        parts[0] + ",\n" + ",\n".join(parts[1:])
        + f"\nSELECT node, round(r, 10) AS r FROM r{iterations} ORDER BY node"
    )
    return {r[0]: r[1] for r in con.execute(sql).fetchall()}


@pytest.mark.parametrize("iterations,ckpt", [(1, 3), (3, 2), (5, 2)])
def test_pagerank_n_iterations_vs_duckdb(spark, iterations, ckpt):
    from legate_pandas_spark.operators.analytics import pagerank

    edges = _edge_list()
    edf = spark.createDataFrame(edges, schema="src string, dst string")
    rank = pagerank(edf, iterations=iterations, checkpoint_every=ckpt)
    got = {r["node"]: r["r"] for r in rank.collect()}
    want = _duck_pagerank(edges, iterations)
    assert set(got) == set(want)
    for node, r in want.items():
        assert abs(got[node] - float(r)) < 1e-9, (node, got[node], r)


def test_pagerank_scores_sum_to_one(spark):
    """No dangling mass on a bidirectional graph: total rank stays 1.0."""
    from legate_pandas_spark.operators.analytics import pagerank

    edf = spark.createDataFrame(_edge_list(), schema="src string, dst string")
    total = sum(r["r"] for r in pagerank(edf, iterations=4).collect())
    assert abs(total - 1.0) < 1e-9
