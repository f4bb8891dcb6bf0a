"""Round-6 parity additions: str.translate, str.wrap, melt(ignore_index=False)
— differential vs real pandas, plus hypothesis fuzz for the two str ops."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


def test_str_translate_matches_pandas(spark):
    ps = pd.Series(["hello", "world", "héllo", "", "aaa"])
    s = lps.from_pandas(ps.to_frame("t"), spark=spark)["t"]
    tbl = str.maketrans({"l": "L", "o": None, "é": "e", "a": "xy"})
    assert s.str.translate(tbl).to_pandas().tolist() == ps.str.translate(tbl).tolist()


def test_str_wrap_matches_pandas(spark):
    ps = pd.Series(
        ["the quick brown fox jumps over the lazy dog", "a b c", "single", ""]
    )
    s = lps.from_pandas(ps.to_frame("t"), spark=spark)["t"]
    for w in (6, 10, 12, 80):
        assert s.str.wrap(w).to_pandas().tolist() == ps.str.wrap(w).tolist(), w


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.text(alphabet="abcdeé ", min_size=1, max_size=5), max_size=8),
        min_size=1,
        max_size=5,
    ),
    st.integers(6, 30),
)
def test_str_wrap_fuzz(spark, word_lists, width):
    # words ≤ 5 chars (the documented divergence is long-word breaking only)
    vals = [" ".join(w.strip() for w in ws) for ws in word_lists]
    ps = pd.Series(vals)
    s = lps.from_pandas(ps.to_frame("t"), spark=spark)["t"]
    assert s.str.wrap(width).to_pandas().tolist() == ps.str.wrap(width).tolist()


@settings(max_examples=15, deadline=None)
@given(st.text(alphabet="abcxyz", min_size=0, max_size=12), st.integers(0, 3))
def test_str_translate_fuzz(spark, text, mode):
    tables = [
        str.maketrans({"a": "1", "b": None}),
        str.maketrans("xyz", "XYZ"),
        str.maketrans({"c": "ccc"}),
        {},
    ]
    tbl = tables[mode]
    ps = pd.Series([text, text * 2])
    s = lps.from_pandas(ps.to_frame("t"), spark=spark)["t"]
    assert s.str.translate(tbl).to_pandas().tolist() == ps.str.translate(tbl).tolist()


def test_melt_ignore_index_false(spark):
    pdf = pd.DataFrame(
        {"id": [1, 2, 3], "a": [10, 20, 30], "b": [40, 50, 60], "c": [7, 8, 9]}
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.melt(id_vars="id", ignore_index=False).to_pandas().reset_index(drop=True)
    want = pdf.melt(id_vars="id", ignore_index=False).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_melt_ignore_index_false_after_sort(spark):
    # the order key must reflect the CURRENT (sorted) row order
    pdf = pd.DataFrame({"id": [3, 1, 2], "a": [30, 10, 20], "b": [6, 4, 5]})
    ldf = lps.from_pandas(pdf, spark=spark).sort_values("id")
    got = ldf.melt(id_vars="id", ignore_index=False).to_pandas().reset_index(drop=True)
    want = (
        pdf.sort_values("id")
        .melt(id_vars="id", ignore_index=False)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
