"""Round-8: pay-as-you-go identity guard + shared LSH pair stage.

The exact max-group-size probe must (a) drop the rep-indirection (gid
stamping, member-expansion joins) on clone-free corpora so the unguarded
plan comes back, (b) keep it on clone-dense corpora (round-7 adversarial
tests still cover the sub-linear path), and (c) never change results either
way — both branches are exact. lsh_verified_pairs must memoize per
(session, sf_dir) so composed audits reuse the persisted pair list.
"""
import os

import pandas as pd
import pytest

import pyspark.sql.functions as F


def _clean_corpus(n=30):
    """No two docs share a shingle set: every identity group is a singleton."""
    rows = [
        (i, "en", f"unique document number {i} about topic {i * 7} with "
                  f"content token{i} token{i+1} token{i+2} tail {i*13}")
        for i in range(n)
    ]
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


def _write(docs, tmp_path, name):
    p = str(tmp_path / name)
    os.makedirs(p, exist_ok=True)
    docs.to_parquet(os.path.join(p, "documents.parquet"), index=False)
    return p


def test_clean_corpus_takes_direct_path(spark, tmp_path):
    """Singleton groups ⇒ no expansion joins in the plan (no least/greatest
    pair normalization, which only the guarded expansion branch emits)."""
    from legate_pandas_spark.operators.dedup import _lsh_pairs_guarded

    p = _write(_clean_corpus(), tmp_path, "clean")
    out = _lsh_pairs_guarded(spark, p)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the expansion branch normalizes pairs via least/greatest over doc_id —
    # (the shingle generator's greatest(size-2, 1) doesn't match this token)
    assert "least(doc_id" not in plan
    assert "greatest(doc_id" not in plan


def test_adversarial_corpus_keeps_guard(spark, tmp_path):
    from legate_pandas_spark.operators.dedup import _lsh_pairs_guarded

    clone = "the quick brown fox jumps over the lazy dog every single day"
    docs = pd.DataFrame(
        [(i, "en", clone) for i in range(40)]
        + [(900, "en", "some totally unrelated content about catalyst")],
        columns=["doc_id", "lang", "text"],
    )
    p = _write(docs, tmp_path, "adv")
    out = _lsh_pairs_guarded(spark, p)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # expansion branch present
    assert "least(doc_id" in plan and "greatest(doc_id" in plan
    # and the clique is fully expanded
    assert out.filter(F.col("jaccard") == 1.0).count() == 40 * 39 // 2


def test_direct_path_matches_oracle_on_clean_corpus(spark, tmp_path):
    import duckdb

    from legate_pandas_spark.operators.dedup import (
        _SQL_LSH_PAIRS,
        _lsh_pairs_guarded,
    )

    # a clean corpus with one genuine NEAR-dup pair (distinct shingle sets)
    docs = _clean_corpus(20)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs.loc[len(docs)] = [500, "en", base]
    docs.loc[len(docs)] = [501, "en", base + " extra"]
    p = _write(docs, tmp_path, "cleannear")
    got = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 4))
        for r in _lsh_pairs_guarded(spark, p).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs)
    exp = sorted(
        (a, b, round(j, 4)) for a, b, j in con.execute(_SQL_LSH_PAIRS).fetchall()
    )
    assert got == exp
    assert (500, 501, pytest.approx(0.8, abs=0.2)) and len(got) >= 1


def test_incremental_shard_direct_path_matches_oracle(spark, tmp_path):
    import duckdb

    from legate_pandas_spark.operators import ORACLES, load_all
    from legate_pandas_spark.operators.dedup import dedup_incremental_shard

    load_all()
    # clone-free corpus with a near-dup straddling the new/old shards
    docs = _clean_corpus(24)  # ids 0..23; %4==0 are 'new'
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs.loc[len(docs)] = [100, "en", base]          # new shard (100 % 4 == 0)
    docs.loc[len(docs)] = [101, "en", base + " extra"]  # old shard
    p = _write(docs, tmp_path, "shardclean")
    con = duckdb.connect()
    con.register("documents", docs)
    exp = sorted(con.execute(ORACLES["dedup_incremental_shard"]).fetchall())
    got = sorted(tuple(r) for r in dedup_incremental_shard(spark, p).collect())
    assert got == exp


def test_lsh_verified_pairs_memoized(spark, sf_dir):
    from legate_pandas_spark.operators.dedup import lsh_verified_pairs

    a = lsh_verified_pairs(spark, sf_dir)
    b = lsh_verified_pairs(spark, sf_dir)
    assert a is b
    assert a.storageLevel.useMemory or a.storageLevel.useDisk


def test_cross_split_leakage_reuses_pair_stage(spark, sf_dir, duck):
    """After dedup_minhash_lsh runs, the leakage audit consumes the SAME
    persisted pair frame (InMemoryRelation in its plan), and still matches
    its oracle."""
    from legate_pandas_spark.operators import ORACLES, load_all
    from legate_pandas_spark.operators.curation import cross_split_leakage
    from legate_pandas_spark.operators.dedup import dedup_minhash_lsh

    load_all()
    dedup_minhash_lsh(spark, sf_dir).count()  # warms the memoized stage
    out = cross_split_leakage(spark, sf_dir)
    plan = out._jdf.queryExecution().withCachedData().toString()
    assert "InMemoryRelation" in plan
    got = sorted(tuple(r) for r in out.collect())
    exp = sorted(tuple(r) for r in duck.execute(ORACLES["cross_split_leakage"]).fetchall())
    assert got == exp
