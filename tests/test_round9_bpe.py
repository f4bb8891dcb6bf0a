"""bpe_merge_learn: the two-pass literal-replace merge trick vs a true
left-to-right BPE merge (pure-Python reference), property-fuzzed; plus a
Spark end-to-end differential on an adversarial repeated-pair corpus."""

import os

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SEP = "·"


def _frame(symbols):
    return SEP + SEP.join(symbols) + SEP


def _replace_merge(s, a, b):
    # Python str.replace is left-to-right non-overlapping — the same contract
    # as Spark F.replace and DuckDB replace(). Mirror of the engine's
    # doubled-separator scheme (textops._BPE_SEP comment): double separators,
    # replace '·a··b·' -> '·ab·', collapse '··' -> '·'.
    pat, rep = SEP + a + SEP + SEP + b + SEP, SEP + a + b + SEP
    return s.replace(SEP, SEP + SEP).replace(pat, rep).replace(SEP + SEP, SEP)


def _bpe_merge(symbols, a, b):
    """True BPE merge application: greedy left-to-right over the symbol list."""
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _pair_counts(word_freqs, split):
    counts = {}
    for w, f in word_freqs.items():
        syms = split(w)
        for x, y in zip(syms, syms[1:]):
            counts[(x, y)] = counts.get((x, y), 0) + f
    return counts


SYMS = st.sampled_from(["a", "b", "c", "ab", "ba", "aa", "bb", "abc"])


@settings(max_examples=2000, deadline=None)
@given(st.lists(SYMS, min_size=0, max_size=12), SYMS, SYMS)
def test_replace_merge_is_exact_bpe_merge(symbols, a, b):
    got = _replace_merge(_frame(symbols), a, b)
    want = _frame(_bpe_merge(symbols, a, b))
    assert got == want


def _py_bpe_round(texts, topk=10):
    """Pure-Python reference of the whole bpe_merge_learn catalog query."""
    import re

    wf = {}
    for t in texts:
        for w in re.findall(r"[a-z]+", (t or "").lower()):
            wf[w] = wf.get(w, 0) + 1
    splits = {w: list(w) for w in wf}
    p1 = _pair_counts(wf, lambda w: splits[w])
    if not p1:
        return []
    rank = lambda kv: (-kv[1], kv[0][0], kv[0][1])
    (ba, bb), _ = sorted(p1.items(), key=rank)[0]
    splits = {w: _bpe_merge(s, ba, bb) for w, s in splits.items()}
    p2 = _pair_counts(wf, lambda w: splits[w])
    rows = []
    for step, p in ((1, p1), (2, p2)):
        for (pa, pb), n in sorted(p.items(), key=rank)[:topk]:
            rows.append((step, pa, pb, n))
    return rows


def test_bpe_merge_learn_adversarial_corpus(spark, tmp_path):
    """Consecutive / overlapping pair occurrences ('aaaa', 'ababab') are the
    exact inputs where a naive one-pass replace diverges from BPE."""
    texts = [
        "aaaa aaa aa a ababab abab ab",
        "banana bananas ana anana",
        "aaaa AAAA a4a a-a",  # pre-tokenizer: lowercase, [a-z]+ runs only
        "zzz zz zzzz zzzzzz",
        None,
        "",
        "mississippi miss issi ppi pp",
        "ababababababab bababa",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t or "") for t in texts],
        }
    )
    d = tmp_path / "corpus"
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(d / "documents.parquet")

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    out = QUERIES["bpe_merge_learn"](spark, str(d)).toPandas()
    got = sorted(map(tuple, out[["step", "pa", "pb", "n"]].itertuples(index=False)))
    want = sorted(_py_bpe_round(texts))
    assert got == want


def test_bpe_merge_learn_plan_shape(spark, sf_dir):
    """The chosen merge must join back as a broadcast of a 1-row
    TakeOrderedAndProject — adding merge rounds must not re-shuffle the
    corpus."""
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    df = QUERIES["bpe_merge_learn"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def _py_bpe_encode(texts, k=4):
    """Pure-Python reference of bpe_encode_corpus: learn k merges, encode."""
    import re

    wf = {}
    doc_words = {}
    for i, t in enumerate(texts):
        ws = re.findall(r"[a-z]+", (t or "").lower())
        doc_words[i] = ws
        for w in ws:
            wf[w] = wf.get(w, 0) + 1
    splits = {w: list(w) for w in wf}
    rank = lambda kv: (-kv[1], kv[0][0], kv[0][1])
    for _ in range(k):
        p = _pair_counts(wf, lambda w: splits[w])
        if not p:
            break
        (ba, bb), _n = sorted(p.items(), key=rank)[0]
        splits = {w: _bpe_merge(s, ba, bb) for w, s in splits.items()}
    rows = []
    for i, ws in doc_words.items():
        if not ws:
            continue
        n_tok = sum(len(splits[w]) for w in ws)
        import math

        rows.append(
            (i, len(ws), n_tok, int(math.floor(n_tok * 10000.0 / len(ws) + 0.5)))
        )
    return sorted(rows)


def test_bpe_encode_corpus_adversarial(spark, tmp_path):
    texts = [
        "aaaa aaa aa a ababab abab ab",
        "banana bananas ana anana banana banana",
        "zzz zz zzzz zzzzzz 12345 !!!",
        None,
        "",
        "mississippi miss issi ppi pp mississippi",
        "ababababababab bababa abab abab",
        "the quick brown fox the the the",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t or "") for t in texts],
        }
    )
    d = tmp_path / "corpus_enc"
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(d / "documents.parquet")

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    out = QUERIES["bpe_encode_corpus"](spark, str(d)).toPandas()
    got = sorted(
        map(
            tuple,
            out[
                ["doc_id", "n_words", "n_bpe_tokens", "tokens_per_word_x10000"]
            ].itertuples(index=False),
        )
    )
    assert got == _py_bpe_encode(texts)


def test_bpe_encode_pair_exhaustion_no_op(spark, tmp_path):
    """A vocabulary that runs out of mergeable pairs before round 4 ('ab' is
    fully merged after one round) must keep its symbol table — the sentinel
    argmax makes later rounds no-ops instead of crossJoin-annihilating sym
    (review finding: the first cut returned ZERO rows here)."""
    texts = ["ab ab ab", "ab", None]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t or "") for t in texts],
        }
    )
    d = tmp_path / "corpus_exh"
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(d / "documents.parquet")

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    out = QUERIES["bpe_encode_corpus"](spark, str(d)).toPandas()
    got = sorted(
        map(
            tuple,
            out[
                ["doc_id", "n_words", "n_bpe_tokens", "tokens_per_word_x10000"]
            ].itertuples(index=False),
        )
    )
    # 'ab' merges to ONE token in round 1; rounds 2-4 are no-ops
    assert got == [(0, 3, 3, 10000), (1, 1, 1, 10000)]
    assert got == _py_bpe_encode(texts)


def test_bpe_encode_k16_adversarial(spark, tmp_path):
    """The parameterized 16-merge form (VERDICT r9 Next #6) against the pure
    pure-Python greedy BPE at the same depth — crosses the k=8 lineage
    checkpoint, so this also exercises localCheckpoint mid-loop."""
    texts = [
        "aaaa aaa aa a ababab abab ab",
        "banana bananas ana anana banana banana",
        "mississippi miss issi ppi pp mississippi",
        "the quick brown fox the the the jumps over the lazy dog",
        "low lower lowest newest widest new newer news",
        None,
        "",
        "pretokenization pretokenizer pretoken token tokens tokenizer",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t or "") for t in texts],
        }
    )
    d = tmp_path / "corpus_k16"
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(d / "documents.parquet")

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    out = QUERIES["bpe_encode_k16"](spark, str(d)).toPandas()
    got = sorted(
        map(
            tuple,
            out[
                ["doc_id", "n_words", "n_bpe_tokens", "tokens_per_word_x10000"]
            ].itertuples(index=False),
        )
    )
    assert got == _py_bpe_encode(texts, k=16)


def test_bpe_learn_cache_is_bounded(spark, tmp_path):
    """ADVICE r9: the merge loop must not pin every intermediate round's
    cache. After the query materializes, at most the FINAL symbol table (plus
    one checkpoint RDD) may remain cached beyond what existed before."""
    texts = ["banana bandana ananas anna nanab" for _ in range(5)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path / "corpus_cache"
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(d / "documents.parquet")

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    QUERIES["bpe_encode_corpus"](spark, str(d)).collect()
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after - before <= 2, f"cache leak: {before} -> {after} persistent RDDs"
