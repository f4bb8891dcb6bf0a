"""label_propagation_communities + jl_projection_distortion: pure-Python
reference differentials (deterministic tie-break LPA; left-fold-exact JL
ratios) and structural invariants."""

import pandas as pd
import pytest

EDGE_SQL = """
WITH cp AS (
    SELECT DISTINCT l_partkey AS p,
           year(o_orderdate) * 12 + month(o_orderdate) AS m,
           o_custkey AS c
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT DISTINCT a.c AS u, b.c AS v
FROM cp a JOIN cp b ON a.p = b.p AND a.m = b.m AND a.c < b.c
"""


@pytest.fixture(scope="module")
def catalog():
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    return QUERIES


def _py_lpa(edges, rounds=2):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, {})
        adj.setdefault(v, {})
        adj[u][v] = adj[u].get(v, 0) + 1
        adj[v][u] = adj[v].get(u, 0) + 1
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            counts = {}
            for m, c in nbrs.items():
                counts[labels[m]] = counts.get(labels[m], 0) + c
            new[n] = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        labels = new
    return labels


def test_lpa_matches_python_reference(catalog, spark, sf_dir, duck):
    edges = duck.execute(EDGE_SQL).fetchall()
    labels = _py_lpa(edges)
    sizes = {}
    for lbl in labels.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    want = sorted((n, lbl, sizes[lbl]) for n, lbl in labels.items())

    out = catalog["label_propagation_communities"](spark, sf_dir).toPandas()
    got = sorted(
        map(
            tuple,
            out[["custkey", "community", "community_size"]].itertuples(index=False),
        )
    )
    assert got == want


def test_lpa_communities_are_graph_nodes(catalog, spark, sf_dir, duck):
    """Every community label is itself a node of the graph (labels only ever
    copy node ids), and sizes sum to the node count."""
    out = catalog["label_propagation_communities"](spark, sf_dir).toPandas()
    nodes = {r[0] for r in duck.execute(f"SELECT u FROM ({EDGE_SQL})").fetchall()}
    nodes |= {r[0] for r in duck.execute(f"SELECT v FROM ({EDGE_SQL})").fetchall()}
    assert set(out.custkey) == nodes
    assert set(out.community) <= nodes
    assert out.groupby("community").size().mul(0).add(out.groupby("community")["community_size"].first()).sum() == len(nodes)


def _seq_fold(vals):
    acc = 0.0
    for t in vals:
        acc += t
    return acc


def _half_up4(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def test_jl_matches_python_reference(catalog, spark, sf_dir):
    from legate_pandas_spark.operators.similarity import DIM, _JL_K, _jl_row

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = [list(map(float, v)) for v in emb.embedding.values]
    ids = list(emb.vec_id.values)
    R = [_jl_row(j) for j in range(_JL_K)]
    Y = [
        [_seq_fold(float(r[i]) * x[i] for i in range(DIM)) for r in R]
        for x in V
    ]

    rows = {}
    for a in range(len(ids)):
        if ids[a] >= 8:
            continue
        n_pairs = n_within = 0
        rmin = rmax = None
        for b in range(len(ids)):
            if ids[b] == ids[a]:
                continue
            d2o = _seq_fold((V[b][i] - V[a][i]) ** 2 for i in range(DIM))
            if not d2o > 0:
                continue
            d2p = (
                _seq_fold((Y[b][j] - Y[a][j]) ** 2 for j in range(_JL_K))
                * 3.0
                / float(_JL_K)
            )
            r = _half_up4(d2p / d2o)
            n_pairs += 1
            if 0.5 <= r <= 1.5:
                n_within += 1
            rmin = r if rmin is None or r < rmin else rmin
            rmax = r if rmax is None or r > rmax else rmax
        rows[int(ids[a])] = (n_pairs, n_within, rmin, rmax)

    out = catalog["jl_projection_distortion"](spark, sf_dir).toPandas()
    for _, row in out.iterrows():
        want = rows[int(row.anchor_id)]
        assert (
            int(row.n_pairs),
            int(row.n_within_50pct),
            row.min_ratio,
            row.max_ratio,
        ) == want
    assert len(out) == len(rows)


def test_jl_majority_within_band(catalog, spark, sf_dir):
    """JL with k=16 is loose, but the central tendency must hold: a majority
    of pairs land within +-50% distortion for every anchor."""
    out = catalog["jl_projection_distortion"](spark, sf_dir).toPandas()
    assert (out.n_within_50pct * 2 > out.n_pairs).all()


from hypothesis import given, settings
from hypothesis import strategies as st

_BASKET = st.lists(
    st.integers(min_value=1, max_value=10), min_size=2, max_size=5, unique=True
)


@settings(max_examples=12, deadline=None)
@given(st.lists(_BASKET, min_size=1, max_size=6))
def test_lpa_fuzz_matches_reference(spark, tmp_path_factory, baskets):
    """Random graphs (label-count ties everywhere, since edge multiplicity is
    collapsed to 1) vs the pure-Python 2-round LPA with the same
    deterministic tie-break."""
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
    d = tmp_path_factory.mktemp("lpafuzz")
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
    out = QUERIES["label_propagation_communities"](spark, str(d)).toPandas()

    edges = set()
    for custs in baskets:
        for x, y in itertools.combinations(sorted(set(custs)), 2):
            edges.add((x, y))
    labels = _py_lpa(sorted(edges))
    sizes = {}
    for lbl in labels.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    want = sorted((n, lbl, sizes[lbl]) for n, lbl in labels.items())
    got = sorted(
        map(
            tuple,
            out[["custkey", "community", "community_size"]].itertuples(index=False),
        )
    )
    assert got == want
