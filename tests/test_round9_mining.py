"""hard_negative_mining: full numpy reference differential (cosines, ranking,
semi-hard band) + the single-cross-score plan discipline."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def catalog():
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    return QUERIES


def _seq_dot(a, b):
    # replicate the engine's order-stable LEFT-FOLD in doubles bit-for-bit
    # (BLAS pairwise summation can differ by ULPs and flip 4dp rounding)
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _half_up4(x):
    # Spark F.round = BigDecimal HALF_UP (away from zero), not banker's
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def test_hard_negative_mining_matches_numpy(catalog, spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = [list(map(float, v)) for v in emb.embedding.values]
    ids = emb.vec_id.values
    labels = emb.label.values
    norms = [np.sqrt(_seq_dot(v, v)) for v in V]

    rows = []
    for a_pos in np.where(ids < 8)[0]:
        sims = np.array(
            [
                _half_up4(_seq_dot(v, V[a_pos]) / (norms[i] * norms[a_pos]))
                for i, v in enumerate(V)
            ]
        )
        mask_self = ids != ids[a_pos]
        pos = mask_self & (labels == labels[a_pos])
        hp = sims[pos].max()
        neg = np.where(mask_self & (labels != labels[a_pos]))[0]
        order = sorted(neg, key=lambda i: (-sims[i], ids[i]))[:5]
        for r, i in enumerate(order, 1):
            rows.append(
                (int(ids[a_pos]), r, int(ids[i]), sims[i], bool(sims[i] < hp))
            )
    want = pd.DataFrame(
        rows, columns=["anchor_id", "rank", "neg_id", "cosine_sim", "semi_hard"]
    ).sort_values(["anchor_id", "rank"]).reset_index(drop=True)

    got = (
        catalog["hard_negative_mining"](spark, sf_dir)
        .toPandas()
        .sort_values(["anchor_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_hard_negative_mining_one_cross_score(catalog, spark, sf_dir):
    """The corpus×anchors score relation must be persisted and shared by the
    hardest-positive branch and the negative-ranking branch — the plan reuses
    one InMemoryTableScan rather than recomputing the cross join."""
    df = catalog["hard_negative_mining"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2
    # the only cross join lives INSIDE the cached relation's one-time build
    # plan; the live plan above the first cache scan must not recompute it
    live = plan.split("InMemoryRelation", 1)[0]
    assert "BroadcastNestedLoopJoin" not in live
    # per-anchor top-5 pushes down as a WindowGroupLimit (partial+final)
    assert "WindowGroupLimit" in live
