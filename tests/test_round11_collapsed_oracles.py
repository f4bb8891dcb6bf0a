"""Round-11 clone-collapsed oracle chain (VERDICT r10 Next #2).

The registered DuckDB oracles for the pair-granular dedup family now run the
naive pipeline on one representative per identical-text group and expand
group pairs back to member pairs — linear in clone mass instead of
C(k,2)-quadratic, which is what made them infeasible at the 100×-docs
corpus. These tests pin the rewrite DuckDB-vs-DuckDB: the collapsed form
must produce BIT-IDENTICAL output to the retired naive form on the real
gate corpora AND on an adversarial clone-dense corpus where groups, 1.0
ties, multi-lang text groups, and shingle-less docs all occur.
"""

import os

import duckdb
import pandas as pd
import pytest

from legate_pandas_spark.operators.dedup import (
    _SQL_COLLAPSED_CTES,
    _SQL_COLLAPSED_PAIRS_SELECT,
    _SQL_CONNECTED_COLLAPSED,
    _SQL_LSH_PAIRS,
    _SQL_LSH_PAIRS_COLLAPSED,
)
from legate_pandas_spark.operators.curation import (
    _C_MIN_GRAMS,
    _C_THRESHOLD,
    _N,
    _SQL_CONTAINMENT_COLLAPSED,
)

# The retired naive forms, kept HERE as executable references (they can't rot
# silently — this test runs them).
_NAIVE_CONTAINMENT = f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t
        FROM documents
    ), grams AS (
        SELECT doc_id, lang,
               CASE WHEN len(t) >= {_N}
                    THEN list_distinct(list_transform(range(1, len(t) - {_N - 2}),
                                                      i -> array_to_string(t[i:i+{_N - 1}], ' ')))
                    ELSE [] END AS gs
        FROM toks
    ), exploded AS (
        SELECT doc_id, lang, len(gs) AS sz, unnest(gs) AS g FROM grams
        WHERE len(gs) >= {_C_MIN_GRAMS}
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               any_value(a.sz) AS sz_a, count(*) AS isect
        FROM exploded a JOIN exploded b
          ON a.lang = b.lang AND a.g = b.g AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, round(isect * 1.0 / sz_a, 4) AS containment
    FROM inter
    WHERE isect * 1.0 / sz_a >= {_C_THRESHOLD}
"""

_NAIVE_CONNECTED = f"""
    WITH RECURSIVE pairs AS (
        {_SQL_LSH_PAIRS}
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach AS (
        SELECT n AS node, n AS r FROM nodes
        UNION
        SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
    )
    SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component_id
    FROM reach GROUP BY node
"""

_SPLIT_AGG = """
    , splits AS (
        SELECT doc_id,
               CASE WHEN ((doc_id * 2654435761) % 4294967296) / 4294967296.0 < 0.8
                    THEN 'train'
                    WHEN ((doc_id * 2654435761) % 4294967296) / 4294967296.0 < 0.9
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT sa.split AS split_a, sb.split AS split_b,
           count(*) AS n_pairs,
           round(sum(p.jaccard), 4) AS sum_jaccard
    FROM pairs p
    JOIN splits sa ON sa.doc_id = p.doc_a
    JOIN splits sb ON sb.doc_id = p.doc_b
    WHERE sa.split <> sb.split
    GROUP BY sa.split, sb.split
"""

_NAIVE_LEAKAGE = f"WITH pairs AS ({_SQL_LSH_PAIRS}){_SPLIT_AGG}"
_COLLAPSED_LEAKAGE = (
    f"WITH {_SQL_COLLAPSED_CTES}, pairs AS ({_SQL_COLLAPSED_PAIRS_SELECT})"
    + _SPLIT_AGG
)

CASES = [
    ("minhash_lsh", _SQL_LSH_PAIRS, _SQL_LSH_PAIRS_COLLAPSED),
    ("connected", _NAIVE_CONNECTED, _SQL_CONNECTED_COLLAPSED),
    ("containment", _NAIVE_CONTAINMENT, _SQL_CONTAINMENT_COLLAPSED),
    ("leakage", _NAIVE_LEAKAGE, _COLLAPSED_LEAKAGE),
]


def _con_for(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    path = f"{sf_dir}/documents.parquet"
    src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name,naive,collapsed", CASES, ids=[c[0] for c in CASES])
def test_collapsed_equals_naive_on_gate_corpus(name, naive, collapsed, sf_dir):
    con = _con_for(sf_dir)
    a = _canon(con.execute(naive).df())
    b = _canon(con.execute(collapsed).df())
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    if name == "minhash_lsh":
        assert len(a) > 0  # non-vacuous


@pytest.mark.parametrize("name,naive,collapsed", CASES, ids=[c[0] for c in CASES])
def test_collapsed_equals_naive_on_clone_dense_corpus(
    name, naive, collapsed, tmp_path
):
    """Adversarial corpus: 6-member identical groups (within-pairs), a pair
    of near-dup groups (cross expansion), one text shared across two langs
    (the containment group-key trap), a shingle-less clone group (must emit
    nothing), and singletons."""
    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = []
    did = 0

    def add(text, lang="en", k=1):
        nonlocal did
        for _ in range(k):
            rows.append({"doc_id": did, "text": text, "lang": lang,
                         "source": "t", "n_chars": len(text)})
            did += 3  # non-contiguous ids: orderings can't pass by luck

    add(base * 4, k=6)                      # clone group A
    add(base * 4 + "extra tail tokens here", k=5)   # group B ~ near-dup of A
    add("totally different content " * 10, k=4)     # clone group C (isolated)
    add("short", k=3)                        # shingle-less group (no output)
    add(base * 4, lang="de", k=2)            # same TEXT as A, different lang
    add("unique singleton document with enough tokens to shingle properly", k=1)
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")

    con = _con_for(str(tmp_path))
    a = _canon(con.execute(naive).df())
    b = _canon(con.execute(collapsed).df())
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    assert len(a) > 0, name  # every case must actually exercise output
