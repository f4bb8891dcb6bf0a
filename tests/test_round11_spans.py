"""Round-11 exact_substring_spans (ExactSubstr fixed-k approximation, Lee et
al. 2022): maximal cross-document repeated token spans. Differential coverage
beyond the DuckDB oracle (both engines share the gaps-and-islands idea, so a
mirrored merge bug would gate green): a brute-force pure-Python reference —
mark every token covered by a shared-with-another-doc k-gram, take maximal
runs of marked tokens — checked on seeded random corpora where overlap,
adjacency, multiple islands, and anchor-free docs all occur."""

import numpy as np
import pandas as pd
import pytest

K = 5  # _N in curation.py


def _brute_spans(texts: dict[int, str]) -> set[tuple[int, int, int, int, int]]:
    toks = {d: t.split() for d, t in texts.items()}
    gram_docs: dict[str, set[int]] = {}
    for d, t in toks.items():
        for i in range(len(t) - K + 1):
            gram_docs.setdefault(" ".join(t[i : i + K]), set()).add(d)
    out = set()
    for d, t in toks.items():
        covered = np.zeros(len(t), dtype=bool)
        anchors = []
        for i in range(len(t) - K + 1):
            if len(gram_docs[" ".join(t[i : i + K])]) >= 2:
                covered[i : i + K] = True
                anchors.append(i)
        # maximal runs of covered tokens
        i = 0
        while i < len(t):
            if covered[i]:
                j = i
                while j + 1 < len(t) and covered[j + 1]:
                    j += 1
                n_anch = sum(1 for a in anchors if i <= a <= j)
                out.add((d, i + 1, j + 1, j - i + 1, n_anch))  # 1-based
                i = j + 1
            else:
                i += 1
    return out


def _corpus(rng, n_docs=30, vocab=14, length=40):
    """Small vocab forces real cross-doc k-gram collisions."""
    words = [f"w{i}" for i in range(vocab)]
    texts = {}
    for d in range(n_docs):
        n = rng.randint(K - 2, length)  # some docs too short to anchor
        texts[d * 7] = " ".join(words[rng.randint(0, vocab)] for _ in range(n))
    # guaranteed structure: one exact clone pair, one partial overlap
    texts[997] = texts[0]
    texts[998] = "unique prefix tokens here " + texts[0]
    return texts


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_spans_match_brute_force(spark, tmp_path, seed):
    rng = np.random.RandomState(seed)
    texts = _corpus(rng)
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": "en",
            "source": "t",
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    d = tmp_path / f"spans_{seed}"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet")

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    got = QUERIES["exact_substring_spans"](spark, str(d)).toPandas()
    got_set = set(
        map(
            tuple,
            got[
                ["doc_id", "span_start", "span_end", "span_tokens", "n_anchors"]
            ].itertuples(index=False),
        )
    )
    want = _brute_spans(texts)
    assert got_set == want
    assert len(want) > 0  # corpora must actually produce spans
    # structure checks: the clone pair is fully covered end to end
    n0 = len(texts[0].split())
    assert (997, 1, n0, n0, n0 - K + 1) in want

    # the CUT step against the same brute-force coverage marks
    import hashlib

    cut = (
        QUERIES["exact_substring_cut"](spark, str(d))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    spans_by_doc: dict[int, list] = {}
    for dd, s, e, *_ in want:
        spans_by_doc.setdefault(dd, []).append((s, e))
    for dd, text in texts.items():
        t = text.split()
        covered = np.zeros(len(t), dtype=bool)
        for s, e in spans_by_doc.get(dd, []):
            covered[s - 1 : e] = True
        clean = " ".join(w for w, c in zip(t, covered) if not c)
        row = cut.loc[dd]
        assert row["n_tokens"] == len(t)
        assert row["n_cut"] == int(covered.sum())
        assert row["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()
    # the clone pair must be cut to nothing
    assert cut.loc[997, "n_cut"] == cut.loc[997, "n_tokens"]
