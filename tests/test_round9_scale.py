"""Round-9 scale work: the semdedup centroid cap and the sampled-GT recall
evaluation (VERDICT r8 Next #1/#2). The cap keeps the assignment stage
linear past ~262k vectors; the sampled recall form must agree with the exact
form's IVF structure (same centroids) and keep the nprobe dominance."""
import pandas as pd
import pytest

from legate_pandas_spark.operators.similarity import (
    N_IVF_CENTROIDS,
    SEMDEDUP_MAX_K,
    SEMDEDUP_TARGET_CLUSTER,
    _semdedup_k,
)


def test_semdedup_k_adaptive_then_capped():
    assert _semdedup_k(100) == N_IVF_CENTROIDS  # floor
    assert _semdedup_k(2000) == max(N_IVF_CENTROIDS, 2000 // 128)
    # adaptive region
    assert _semdedup_k(128 * 1000) == 1000
    # cap binds: assignment budget is n * SEMDEDUP_MAX_K from here on
    assert _semdedup_k(128 * SEMDEDUP_MAX_K) == SEMDEDUP_MAX_K
    assert _semdedup_k(10**9) == SEMDEDUP_MAX_K
    # the oracle SQL carries the identical cap
    from legate_pandas_spark.operators.similarity import _SQL_SEMDEDUP_ASSIGN

    assert f"least(" in _SQL_SEMDEDUP_ASSIGN
    assert str(SEMDEDUP_MAX_K) in _SQL_SEMDEDUP_ASSIGN
    assert str(SEMDEDUP_TARGET_CLUSTER) in _SQL_SEMDEDUP_ASSIGN


def test_recall_eval_sampled_properties(spark, sf_dir):
    """The sampled form returns the full query x nprobe grid, recall in
    [0,1], and nprobe=2 recall dominates nprobe=1 per query (more probed
    clusters can only add candidates)."""
    from legate_pandas_spark.operators.similarity import ann_recall_eval_sampled

    got = ann_recall_eval_sampled(spark, sf_dir).toPandas()
    assert len(got) == 16  # 8 queries x nprobe {1,2}
    assert got["recall_at_5"].between(0, 1).all()
    wide = got.pivot(index="query_id", columns="nprobe", values="recall_at_5")
    assert (wide[2] >= wide[1]).all()


def test_lsh_approx_twin_finds_planted_clones(spark, tmp_path):
    """Multi-table LSH blocked-cosine twin: identical vectors collide in
    EVERY table (probability-1 guarantee), so planted clone pairs must
    surface at the top; output shape matches the exact twin."""
    import numpy as np
    import pandas as pd

    from legate_pandas_spark.operators.similarity import (
        dedup_cosine_blocked_lsh_approx,
        dedup_embedding_cosine_blocked,
    )

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    for lbl in range(3):
        base = rng.randn(64).astype("float32")
        for _ in range(3):  # 3 identical clones per label
            rows.append((vid, lbl, base.tolist()))
            vid += 1
        for _ in range(5):  # noise vectors
            rows.append((vid, lbl, rng.randn(64).astype("float32").tolist()))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    d = tmp_path / "corpus"
    d.mkdir()
    pdf.to_parquet(str(d / "embeddings.parquet"), index=False)

    approx = dedup_cosine_blocked_lsh_approx(spark, str(d)).collect()
    exact = dedup_embedding_cosine_blocked(spark, str(d)).collect()
    # every planted clone pair (cosine 1.0) appears in the approx result
    clones = {
        (r["label"], r["vec_a"], r["vec_b"])
        for r in exact
        if r["cosine_sim"] >= 0.9999
    }
    assert len(clones) == 9  # 3 labels x C(3,2)
    got = {(r["label"], r["vec_a"], r["vec_b"]) for r in approx}
    assert clones <= got
    # and they rank at the top of each label's list
    for r in approx:
        if (r["label"], r["vec_a"], r["vec_b"]) in clones:
            assert r["cosine_sim"] >= 0.9999
