"""Round-7: blocked-cosine identical-vector skew guard — identity-grouped
pairing must return EXACTLY the unguarded top-5-per-label, including when one
label block is dominated by many copies of the same embedding (the k² case)."""
import os

import numpy as np
import pytest

import pyspark.sql.functions as F


def _mk_embeddings(n_clones=80, dim=8, seed=7):
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    clone = rng.normal(size=dim).astype("float64")
    # adversarial: one label block where n_clones vectors are identical
    for i in range(n_clones):
        rows.append((i, "hot", clone.tolist()))
    # same block also has distinct vectors (so cross-group pairs exist)
    for i in range(5):
        rows.append((1000 + i, "hot", rng.normal(size=dim).tolist()))
    # a clean block
    for i in range(12):
        rows.append((2000 + i, "cold", rng.normal(size=dim).tolist()))
    return pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])


def _oracle(docs_pdf):
    import duckdb

    con = duckdb.connect()
    con.register("embeddings", docs_pdf)
    from legate_pandas_spark.operators import ORACLES, load_all

    load_all()
    rows = con.execute(ORACLES["dedup_embedding_cosine_blocked"]).fetchall()
    return sorted((l, a, b, round(c, 4)) for l, a, b, c in rows)


def _spark(spark, docs_pdf, tmp_path):
    from legate_pandas_spark.operators.similarity import dedup_embedding_cosine_blocked

    p = str(tmp_path / "sfdir")
    os.makedirs(p, exist_ok=True)
    docs_pdf.to_parquet(os.path.join(p, "embeddings.parquet"), index=False)
    out = dedup_embedding_cosine_blocked(spark, p)
    return sorted(
        (r["label"], r["vec_a"], r["vec_b"], round(r["cosine_sim"], 4))
        for r in out.collect()
    )


def test_adversarial_identical_vectors_match_oracle(spark, tmp_path):
    docs = _mk_embeddings()
    got = _spark(spark, docs, tmp_path)
    exp = _oracle(docs)
    assert got == exp
    # the hot block's top-5 is the clone clique's smallest-id pairs at 1.0
    hot = [p for p in got if p[0] == "hot"]
    assert len(hot) == 5 and all(p[3] == 1.0 for p in hot)
    assert hot[0][1:3] == (0, 1)


def test_pair_stage_runs_on_group_reps(spark, tmp_path):
    """80 identical vectors collapse to one identity group: the rep-level
    pair stage for the hot label sees 6 groups (1 clique + 5 distinct), not
    85 vectors."""
    import pandas as pd

    docs = _mk_embeddings()
    p = str(tmp_path / "sfdir2")
    os.makedirs(p, exist_ok=True)
    docs.to_parquet(os.path.join(p, "embeddings.parquet"), index=False)
    from legate_pandas_spark.sources.tables import load_table

    emb = load_table(spark, p, "embeddings")
    n_groups = (
        emb.filter(F.col("label") == "hot")
        .select("embedding")
        .distinct()
        .count()
    )
    assert n_groups == 6


def test_boundary_tie_band_kept_whole(spark, tmp_path):
    """Two group pairs tie exactly at the 5-pair threshold: both must expand
    (prefix cover keeps the whole cosine tie band)."""
    import pandas as pd

    # label with two identical-pairs groups: vectors v1 x3 (3 within pairs at
    # 1.0) and v2 x3 (3 more at 1.0) — threshold lands inside the 1.0 band
    rows = []
    v1 = [1.0, 0.0, 0.0]
    v2 = [0.0, 1.0, 0.0]
    for i in range(3):
        rows.append((i, "t", v1))
    for i in range(3):
        rows.append((10 + i, "t", v2))
    docs = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    got = _spark(spark, docs, tmp_path)
    exp = _oracle(docs)
    assert got == exp
    assert len([p for p in got if p[0] == "t"]) == 5
