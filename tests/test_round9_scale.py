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
