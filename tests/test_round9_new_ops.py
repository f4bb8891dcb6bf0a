"""Round-9 continuation ops: segment-level dedup + reassembly and BM25
bench retrieval — semantic invariants and plan pins beyond the differential
oracle row in test_oracle_parity."""

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


def test_segment_dedup_reassembly_integrity(catalog, spark, sf_dir, duck):
    """Documents that lost nothing must reassemble byte-identically to the
    single-space rejoin of their own tokens, and the corpus-wide survivor
    count must equal the number of DISTINCT segment texts (keep-first keeps
    exactly one occurrence per distinct segment)."""
    out = catalog["segment_dedup_reassemble"](spark, sf_dir).toPandas()
    exp = duck.execute(
        """
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents
        )
        SELECT doc_id, md5(array_to_string(t, ' ')) AS h,
               CAST(ceil(len(t) / 8.0) AS BIGINT) AS n_segments
        FROM toks
        """
    ).df()
    m = out.merge(exp, on="doc_id")
    intact = m[m.n_kept == m.n_segments_x]
    assert len(intact) > 0
    assert (intact.kept_md5 == intact.h).all()
    n_distinct = duck.execute(
        """
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents
        )
        SELECT count(DISTINCT w) FROM (
            SELECT unnest(list_transform(
                range(0, CAST(ceil(len(t) / 8.0) AS BIGINT)),
                i -> array_to_string(t[i*8+1 : i*8+8], ' '))) AS w
            FROM toks
        )
        """
    ).fetchone()[0]
    assert int(out.n_kept.sum()) == int(n_distinct)
    assert (out.n_kept <= out.n_segments).all()


def test_bm25_result_invariants(catalog, spark, sf_dir):
    """No query doc retrieves itself or another query doc; ranks are dense
    1..3 per query; scores are non-increasing along the rank order."""
    out = catalog["bm25_bench_retrieval"](spark, sf_dir).toPandas()
    # the benchmark slice is CAPPED at doc_id < 5000 (eval sets don't grow
    # with the corpus): retrieved docs must not be query-slice members, but
    # slot docs at/above the cap are legitimate corpus members
    assert not ((out.doc_id % 97 == 3) & (out.doc_id < 5000)).any()
    assert ((out.query_id % 97 == 3) & (out.query_id < 5000)).all()
    for _, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g.score.diff().dropna() <= 1e-12).all()


def test_round9_new_ops_plan_shapes(catalog, spark, sf_dir):
    """segment_dedup: the keep-first window hash-partitions on the segment
    text and nothing is cartesian; bm25: the query-term / df / stats sides
    all broadcast into the corpus tf stream."""
    plan = plan_text(catalog["segment_dedup_reassemble"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(w" in plan
    plan2 = plan_text(catalog["bm25_bench_retrieval"](spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan2
    assert plan2.count("BroadcastHashJoin") >= 3  # semi(qvocab), qterms, df
    assert "BroadcastNestedLoopJoin" in plan2  # the 1-row stats cross join


def test_ingest_tag_report_plan_and_semantics(catalog, spark, sf_dir):
    """The composed tagging row: stores broadcast (two BroadcastHashJoins,
    no cartesian), and streaming the prior corpus's own shard against it
    flags exact dups consistently with signature dups (exact => signature
    whenever the doc has a signature)."""
    df = catalog["ingest_tag_report"](spark, sf_dir)
    plan = plan_text(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    out = df.toPandas()
    assert len(out) > 0
    # an exact dup with a signature is necessarily a signature dup
    sigged = out[out.n_words >= 3]
    bad = sigged[sigged.is_exact_dup & ~sigged.is_sig_neardup]
    assert len(bad) == 0


def test_query_scalar_logic_matches_pandas(spark):
    """Regression for the round-9 grammar-fuzz finding: pandas (python
    engine) maps and/or/not to &/|/~, so a column-free atom is a Python
    SCALAR — `not (0 <= 0)` is ~True == -2 — and combining it with a mask
    follows bitwise-collapse rules (`mask & -2` empties, `mask | -2`
    floods). Pin the falsifying example and the semantic corner cases."""
    import pandas as pd

    import legate_pandas_spark as lps

    pdf = pd.DataFrame(
        {"a": [-7, -3, -1, 0, 1, 2, 5, 9, 12, -12],
         "b": [3, -4, 7, 2, -9, 0, 1, -1, 6, 8],
         "c": [0, 1, -2, 5, 3, -8, 13, 4, -6, 2]}
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    exprs = [
        "((a < a) or (not ((0 <= 0) and (0 <= 0))))",  # the falsifier: all rows
        "((a == a) and (not (0 <= 0)))",               # & even scalar: empty
        "not ((a > 0) and (not (1 == 2)))",            # & odd scalar: mask, ~logical
        "not ((a < 0) or (not (0 <= 0)))",             # | nonzero: flood, then empty
        "((a > 0) and (0 <= 0))",                      # & scalar True: mask
        "not ((a > 0) or (0 <= 0))",                   # | scalar True: flood
    ]
    for e in exprs:
        want = sorted(map(tuple, pdf.query(e)[["a", "b", "c"]].values.tolist()))
        got = sorted(
            map(tuple, ldf.query(e).to_pandas()[["a", "b", "c"]].values.tolist())
        )
        assert got == want, e


def test_query_scalar_logic_proves_nothing():
    """Scalar-logic trees bypass the boolean-atom proof rules — the proof
    set must be empty (the bitwise collapse can keep rows no atom kept)."""
    from legate_pandas_spark.frontend.query import query_proof_columns

    assert query_proof_columns("(a > 0) and (not (0 <= 0))") == frozenset()
    assert query_proof_columns("(a > 0) and (b < 1)") == {"a", "b"}


def _segment_dedup_reference(texts):
    """Pure-Python reference of segment_dedup_reassemble over (doc_id, text)
    pairs: 8-token segments, corpus-wide keep-first by (doc_id, seg_idx),
    reassemble survivors in order."""
    import hashlib

    segs = {}
    for doc_id, text in texts:
        toks = __import__("re").split(r"\s+", text.strip())
        segs[doc_id] = [
            " ".join(toks[i : i + 8]) for i in range(0, len(toks), 8)
        ]
    seen = set()
    out = {}
    for doc_id in sorted(segs):
        kept = []
        for w in segs[doc_id]:
            if w not in seen:
                seen.add(w)
                kept.append(w)
        new_text = " ".join(kept)
        out[doc_id] = (
            len(segs[doc_id]),
            len(kept),
            len(new_text),
            hashlib.md5(new_text.encode()).hexdigest(),
        )
    return out


def test_segment_dedup_property_fuzz(spark, tmp_path):
    """Hypothesis-style randomized corpora (fixed seeds — hypothesis would
    re-init Spark per example) with adversarial shapes: heavy cross-doc
    segment cloning, shared prefixes, single-token docs, exact-duplicate
    documents — the Spark pipeline must match the pure-Python keep-first
    reference on every field including the reassembly md5."""
    import random

    import pandas as pd

    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for seed in range(6):
        rng = random.Random(seed)
        texts = []
        n_docs = rng.randint(1, 12)
        blocks = [
            " ".join(rng.choice(vocab) for _ in range(8)) for _ in range(4)
        ]
        for d in range(n_docs):
            if rng.random() < 0.2 and texts:
                texts.append((d, texts[rng.randrange(len(texts))][1]))
                continue
            parts = []
            for _ in range(rng.randint(1, 5)):
                if rng.random() < 0.5:
                    parts.append(rng.choice(blocks))  # cloned 8-token block
                else:
                    parts.append(
                        " ".join(
                            rng.choice(vocab)
                            for _ in range(rng.randint(1, 11))
                        )
                    )
            texts.append((d, " ".join(parts)))
        sf_dir = tmp_path / f"corpus{seed}"
        sf_dir.mkdir()
        pd.DataFrame(
            {
                "doc_id": [d for d, _ in texts],
                "text": [t for _, t in texts],
                "lang": "en",
                "source": "fuzz",
                "n_chars": [len(t) for _, t in texts],
            }
        ).to_parquet(sf_dir / "documents.parquet", index=False)
        got = {
            r["doc_id"]: (
                r["n_segments"],
                r["n_kept"],
                r["kept_chars"],
                r["kept_md5"],
            )
            for r in QUERIES["segment_dedup_reassemble"](
                spark, str(sf_dir)
            ).collect()
        }
        want = _segment_dedup_reference(texts)
        assert got == want, f"seed {seed}"


def test_query_scalar_logic_review_regressions(spark):
    """Round-9 review findings: (1) `~` mixing with a constant atom must
    translate (the scalar-logic router initially rejected UnaryOp(Invert));
    (2) eval() is a VALUE context — a column-free expression yields its
    Python value as a literal, never a row-selection boolean."""
    import pandas as pd

    import legate_pandas_spark as lps

    pdf = pd.DataFrame({"a": [-3, 0, 2, 7], "b": [1, 2, 3, 4]})
    ldf = lps.from_pandas(pdf, spark=spark)
    # finding 1: ~mask and const atom
    for e in ["~(a > 0) and (0 <= 0)", "~(a > 0) or (not (1 == 1))"]:
        want = sorted(pdf.query(e).a.tolist())
        got = sorted(ldf.query(e).to_pandas().a.tolist())
        assert got == want, e
    # finding 2: eval value semantics for column-free expressions
    assert pdf.eval("(1 < 2) * 5") == 5
    got = ldf.eval("x = (1 < 2) * 5").to_pandas()
    assert list(got["x"]) == [5, 5, 5, 5]
    assert pdf.eval("not (0 <= 0)") == -2
    got2 = ldf.eval("y = not (0 <= 0)").to_pandas()
    assert list(got2["y"]) == [-2, -2, -2, -2]
    # boolean-shaped value with columns: the collapsed bool series
    want3 = pdf.eval("(a > 0) and (not (0 <= 0))").tolist()
    got3 = ldf.eval("z = (a > 0) and (not (0 <= 0))").to_pandas()["z"].tolist()
    assert got3 == want3
    # name-free call atoms are rejected, not eval'd (review finding 6)
    import pytest as _pytest

    from legate_pandas_spark.frontend.query import (
        QueryTranslationError,
        translate_query_expr,
    )

    with _pytest.raises(QueryTranslationError):
        translate_query_expr("(a > 0) and ((1).bit_length() <= 0)")


def test_from_pandas_allnull_object_column(spark):
    """An all-None object column defeats Spark's schema inference — the
    facade ships the dtype-derived schema explicitly (string, pandas' own
    convention). Found via the merge fuzz: pandas 2.2.2 itself crashes on
    the outer merge this enables (duplicate left keys + all-None right
    key), while the facade returns the semantically correct 3-row result."""
    import pandas as pd

    from legate_pandas_spark import from_pandas

    rpdf = pd.DataFrame({"k": [None, None], "w": [1.0, 2.0]})
    ldf = from_pandas(rpdf, spark=spark)
    out = ldf.to_pandas()
    assert list(out.columns) == ["k", "w"]
    assert out["k"].isna().all()
    assert [str(f.dataType) for f in ldf._sdf.schema.fields][0] == "StringType()"
    # the pandas-crashing shape: our engine still answers correctly
    lpdf = pd.DataFrame({"k": ["a", "a"], "v": [0.0, 1.0]})
    m = (
        from_pandas(lpdf, spark=spark)
        .merge(from_pandas(pd.DataFrame({"k": [None], "w": [0.0]}), spark=spark),
               on="k", how="outer")
        .to_pandas()
    )
    assert len(m) == 3  # 2 unmatched-left + 1 unmatched-right
    assert m["k"].isna().sum() == 1
