"""Round-5: containment dedup hot-gram guard — the capped candidate path must
return EXACTLY what the uncapped exact path returns whenever every qualifying
pair shares at least one rare gram (the guard's documented contract)."""

import pytest


def _mk_docs(spark, n_hot_docs=30):
    """Corpus with a ubiquitous boilerplate 6-gram (df = n_hot_docs, forced hot
    via a tiny cap) plus genuine near-dup clones that also share rare grams."""
    rows = []
    boiler = "terms of service apply to everything"
    for i in range(n_hot_docs):
        rows.append((i, "en", f"{boiler} unique tail {i} alpha beta gamma delta epsilon zeta"))
    # clone pair: shares rare grams (high containment)
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows.append((1000, "en", f"{boiler} {base}"))
    rows.append((1001, "en", f"{boiler} {base} extra suffix words here"))
    return spark.createDataFrame(rows, schema="doc_id long, lang string, text string")


def _run(spark, docs, cap):
    from legate_pandas_spark.operators.curation import _containment_pairs

    out = _containment_pairs(docs, cap=cap)
    return sorted(
        (r["doc_a"], r["doc_b"], r["containment"]) for r in out.collect()
    )


def test_guarded_path_matches_exact_path(spark):
    docs = _mk_docs(spark)
    exact = _run(spark, docs, cap=10**9)  # cap never binds → fast exact path
    guarded = _run(spark, docs, cap=8)  # boilerplate grams (df=32) become hot
    assert guarded == exact
    assert len(exact) >= 2  # the clone pair, both directions


def test_guard_branches_actually_differ(spark):
    """Sanity: cap=8 really does classify the boilerplate grams as hot (the
    test above is vacuous if both runs take the same branch)."""
    import pyspark.sql.functions as F

    from legate_pandas_spark.operators.curation import _N, _word_ngrams

    docs = _mk_docs(spark)
    toks = docs.select("doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("t"))
    grams = toks.select("doc_id", _word_ngrams(F.col("t"), _N).alias("gs"))
    df_g = (
        grams.select(F.explode("gs").alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    assert df_g.filter(F.col("df") > 8).count() > 0
