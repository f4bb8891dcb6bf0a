"""Round-7: MinHash-LSH hot-band guard — identity-grouped LSH must return
EXACTLY what the unguarded all-pairs form returns, including on an adversarial
corpus of many identical docs (the k² hot-bucket case), while doing only
O(groups²) candidate work."""
import pytest

import pyspark.sql.functions as F


def _oracle_pairs(docs_pdf):
    """DuckDB ground truth: the catalog's own _SQL_LSH_PAIRS over a custom
    documents table."""
    import duckdb

    from legate_pandas_spark.operators.dedup import _SQL_LSH_PAIRS

    con = duckdb.connect()
    con.register("documents", docs_pdf)
    rows = con.execute(_SQL_LSH_PAIRS).fetchall()
    return sorted((a, b, round(j, 4)) for a, b, j in rows)


def _spark_pairs(spark, docs_pdf, tmp_path):
    import os

    from legate_pandas_spark.operators.dedup import dedup_minhash_lsh

    p = str(tmp_path / "sfdir")
    os.makedirs(p, exist_ok=True)
    docs_pdf.to_parquet(os.path.join(p, "documents.parquet"), index=False)
    out = dedup_minhash_lsh(spark, p)
    return sorted((r["doc_a"], r["doc_b"], round(r["jaccard"], 4)) for r in out.collect())


def _mk_adversarial(n_clones=60):
    """n_clones identical docs (one hot identity group → one LSH bucket per
    band) + a near-dup pair + unrelated docs."""
    import pandas as pd

    clone = "the quick brown fox jumps over the lazy dog every single day"
    rows = [(i, "en", clone) for i in range(n_clones)]
    rows.append((1000, "en", clone + " with a tiny suffix"))
    rows.append((2000, "en", "completely different content about spark and catalyst plans"))
    rows.append((2001, "en", "another unrelated document describing duckdb oracles"))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def test_adversarial_clone_corpus_matches_oracle(spark, tmp_path):
    docs = _mk_adversarial()
    got = _spark_pairs(spark, docs, tmp_path)
    exp = _oracle_pairs(docs)
    assert got == exp
    # the clone clique must be fully present: C(60,2) pairs at jaccard 1.0
    ones = [p for p in got if p[2] == 1.0]
    assert len(ones) >= 60 * 59 // 2


def test_rep_pipeline_sees_one_doc_per_identity_group(spark, tmp_path):
    """The signatures/band/candidate stages must run on representatives only:
    with 60 clones the signature table has 1 row for the clique."""
    import os

    from legate_pandas_spark.operators.dedup import _doc_shingles, _lsh_pairs_guarded

    docs = _mk_adversarial()
    p = str(tmp_path / "sfdir2")
    os.makedirs(p, exist_ok=True)
    docs.to_parquet(os.path.join(p, "documents.parquet"), index=False)
    out = _lsh_pairs_guarded(spark, p)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # guard structure present: the pipeline carries the identity-group window
    assert "gid" in plan
    # and the distinct-candidate join operates on reps: count reps directly
    sh = _doc_shingles(spark, p)
    hv = F.xxhash64("s")
    stats = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(hv, F.lit(2**31))).alias("_hsum"),
        F.bit_xor(hv).alias("_hxor"),
    )
    n_groups = stats.select("n", "_hsum", "_hxor").distinct().count()
    assert n_groups == 4  # clone clique + suffix doc + 2 unrelated


def test_incremental_shard_adversarial_clones(spark, tmp_path):
    """Same guard on the shard path: clones split across new/old shards —
    the group verdict (has_old ∧ has_new ⇒ near) must match the oracle's
    pairwise band-join semantics exactly."""
    import os

    import pandas as pd

    from legate_pandas_spark.operators import ORACLES, load_all
    from legate_pandas_spark.operators.dedup import dedup_incremental_shard

    load_all()
    clone = "the quick brown fox jumps over the lazy dog every single day"
    rows = [(i, "en", clone) for i in range(40)]  # ids 0,4,8.. are 'new'
    rows.append((101, "en", clone + " slightly extended suffix here"))
    rows.append((104, "en", "unrelated text about catalyst physical planning rules"))
    docs = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    p = str(tmp_path / "sfshard")
    os.makedirs(p, exist_ok=True)
    docs.to_parquet(os.path.join(p, "documents.parquet"), index=False)

    import duckdb

    con = duckdb.connect()
    con.register("documents", docs)
    exp = sorted(con.execute(ORACLES["dedup_incremental_shard"]).fetchall())
    got = sorted(
        tuple(r) for r in dedup_incremental_shard(spark, p).collect()
    )
    assert got == exp
    # sanity: the clone clique's new docs are exact dups (identical text)
    assert any(r[1] for r in got)


def test_clean_corpus_unchanged(spark, sf_dir, duck):
    """No-clone regression: the guarded form still matches the oracle on the
    real testdata (same check the driver runs)."""
    from legate_pandas_spark.operators.dedup import _SQL_LSH_PAIRS, dedup_minhash_lsh

    got = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 4))
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    )
    exp = sorted(
        (a, b, round(j, 4)) for a, b, j in duck.execute(_SQL_LSH_PAIRS).fetchall()
    )
    assert got == exp
