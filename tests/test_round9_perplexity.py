"""CCNet-style hashed-bigram LM perplexity filter (perplexity_lm_filter) —
semantic invariants, plan pins, and batch/stream parity beyond the
differential oracle row in test_oracle_parity."""

import pytest


def plan_text(df, mode: str = "formatted") -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(em)


@pytest.fixture(scope="module")
def catalog():
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    return QUERIES


@pytest.fixture(scope="module")
def ppl_out(catalog, spark, sf_dir):
    return catalog["perplexity_lm_filter"](spark, sf_dir).toPandas()


def test_perplexity_row_invariants(ppl_out, duck):
    """n_bigrams == max(len(tokens)-1, 0) per document, and avg_logprob_micro
    is the floor of the integer score over the bigram count."""
    exp = duck.execute(
        """
        WITH toks AS (
            SELECT doc_id, list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
            FROM documents
        )
        SELECT doc_id, CAST(greatest(len(t) - 1, 0) AS BIGINT) AS nb FROM toks
        """
    ).df()
    m = ppl_out.merge(exp, on="doc_id")
    assert len(m) == len(ppl_out)
    assert (m.n_bigrams == m.nb).all()
    scored = ppl_out[ppl_out.n_bigrams > 0]
    assert len(scored) > 0
    import math

    for _, r in scored.head(50).iterrows():
        assert int(r.avg_logprob_micro) == math.floor(
            int(r.logprob_micro) / int(r.n_bigrams)
        )


def test_perplexity_keep_is_corpus_relative(ppl_out):
    """The keep flag must equal the exact integer cross-multiplication
    doc_lp * sum_n > sum_lp * doc_n (recomputed here in unbounded Python
    ints), and it must split the corpus non-trivially — above-average docs
    exist and below-average docs exist."""
    sum_lp = int(ppl_out.logprob_micro.sum())
    sum_n = int(ppl_out.n_bigrams.sum())
    expect = [
        int(lp) * sum_n > sum_lp * int(n)
        for lp, n in zip(ppl_out.logprob_micro, ppl_out.n_bigrams)
    ]
    assert list(ppl_out.keep.astype(bool)) == expect
    assert 0 < int(ppl_out.keep.sum()) < len(ppl_out)


def test_perplexity_plan(catalog, spark, sf_dir):
    """The two LM model joins and the corpus-totals join are broadcasts
    (never a shuffle of the corpus against an 8k-row model), and the only
    nested-loop join is the 1-row totals cross join."""
    plan = plan_text(catalog["perplexity_lm_filter"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    # the cells aggregate is partial+final (map-side combinable)
    assert "partial_count" in plan or "partial_sum" in plan


def test_perplexity_stream_parity(catalog, spark, sf_dir):
    """The streaming scorer applied in batch mode reproduces the batch
    query's (n_bigrams, logprob_micro) bit-for-bit — same integer logits,
    same integer sums."""
    from legate_pandas_spark.operators.curation import perplexity_train_model
    from legate_pandas_spark.sources.tables import load_table
    from legate_pandas_spark.streaming.documents import perplexity_score_stream

    cp, cc = perplexity_train_model(spark, sf_dir)
    assert len(cp) == 8192 and len(cc) == 2048
    assert sum(cp) == sum(cc)  # every training bigram counts once in each
    docs = load_table(spark, sf_dir, "documents")
    got = perplexity_score_stream(docs, cp, cc).toPandas()
    exp = catalog["perplexity_lm_filter"](spark, sf_dir).toPandas()
    m = got.merge(exp, on="doc_id", suffixes=("_s", "_b"))
    assert len(m) == len(exp)
    assert (m.n_bigrams_s == m.n_bigrams_b).all()
    assert (m.logprob_micro_s == m.logprob_micro_b).all()
