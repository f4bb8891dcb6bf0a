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


def _ppl_reference(rows):
    """Pure-Python reference of perplexity_lm_filter over
    (doc_id, text, lang) rows: md5 buckets, add-one integer logits,
    corpus-relative keep via exact integer cross-multiplication."""
    import hashlib
    import math
    import re

    BP, BC = 8192, 2048

    def bucket(s, m):
        return int(hashlib.md5(s.encode()).hexdigest()[:6], 16) % m

    def toks(text):
        if text is None:
            return []
        return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    cp = [0] * BP
    cc = [0] * BC
    for _, text, lang in rows:
        if lang != "en":
            continue
        t = toks(text)
        for a, b in zip(t, t[1:]):
            cp[bucket(a + "_" + b, BP)] += 1
            cc[bucket(a, BC)] += 1
    scores = {}
    for doc_id, text, _ in rows:
        t = toks(text)
        lp = 0
        nb = 0
        for a, b in zip(t, t[1:]):
            nb += 1
            lp += half_away(
                1e6
                * math.log((cp[bucket(a + "_" + b, BP)] + 1) / (cc[bucket(a, BC)] + BP))
            )
        scores[doc_id] = (nb, lp)
    sum_n = sum(nb for nb, _ in scores.values())
    sum_lp = sum(lp for _, lp in scores.values())
    return {
        d: (nb, lp, math.floor(lp / nb) if nb else 0, lp * sum_n > sum_lp * nb)
        for d, (nb, lp) in scores.items()
    }


def test_perplexity_property_fuzz(spark, tmp_path):
    """Randomized corpora (fixed seeds) with adversarial shapes: empty and
    single-token documents, null text, unicode/punctuation-only tokens,
    non-en-only corpora (empty model — every logit is the unseen default),
    and hash-collision-dense tiny vocabularies. The Spark pipeline must
    match the pure-Python reference on every field including the exact
    integer keep flag."""
    import random

    import pandas as pd

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    vocab = ["aa", "bb", "cc", "d9", "é!", "x"]
    langs_pool = [["en", "de"], ["de", "fr"], ["en"], ["en", "zh", "es"]]
    for seed in range(6):
        rng = random.Random(100 + seed)
        langs = langs_pool[seed % len(langs_pool)]
        rows = []
        for d in range(rng.randint(1, 14)):
            r = rng.random()
            if r < 0.1:
                text = None
            elif r < 0.2:
                text = ""
            elif r < 0.3:
                text = rng.choice(vocab)
            else:
                text = " ".join(
                    rng.choice(vocab) for _ in range(rng.randint(2, 40))
                )
            rows.append((d, text, rng.choice(langs)))
        sf_dir = tmp_path / f"ppl{seed}"
        sf_dir.mkdir()
        pd.DataFrame(
            {
                "doc_id": [d for d, _, _ in rows],
                "text": [t for _, t, _ in rows],
                "lang": [l for _, _, l in rows],
                "source": "fuzz",
                "n_chars": [len(t or "") for _, t, _ in rows],
            }
        ).to_parquet(sf_dir / "documents.parquet", index=False)
        got = {
            r["doc_id"]: (
                r["n_bigrams"],
                r["logprob_micro"],
                r["avg_logprob_micro"],
                bool(r["keep"]),
            )
            for r in QUERIES["perplexity_lm_filter"](spark, str(sf_dir)).collect()
        }
        assert got == _ppl_reference(rows), f"seed {seed}"
