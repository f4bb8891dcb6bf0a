"""Round-5: hypothesis fuzz of the merge frontend — random key specs
(on / left_on+right_on / index joins), how-modes, suffix collisions, null and
duplicate keys — differential vs pandas.merge (reference frontend/merge.py
key-resolution semantics, the most intricate frontend path)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


def _mk_frames(draw_ints, null_keys, dup_keys):
    rng = np.random.RandomState(draw_ints)
    n_l, n_r = 8, 6
    keyspace = list(range(5)) if not dup_keys else list(range(3))
    lk = [keyspace[i % len(keyspace)] for i in range(n_l)]
    rk = [keyspace[(i * 2 + 1) % len(keyspace)] for i in range(n_r)]
    if null_keys:
        lk[2] = None
        rk[1] = None
    left = pd.DataFrame(
        {
            "k": pd.array(lk, dtype="Int64"),
            "v": rng.randn(n_l).round(3),
            "shared": [f"L{i}" for i in range(n_l)],
        }
    )
    right = pd.DataFrame(
        {
            "k": pd.array(rk, dtype="Int64"),
            "w": rng.randn(n_r).round(3),
            "shared": [f"R{i}" for i in range(n_r)],
        }
    )
    return left, right


def _canon(pdf):
    pdf = pdf.copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].where(pdf[c].notna(), "<NA>").astype(str)
        else:
            pdf[c] = pdf[c].astype("float64")
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return (
        pdf.fillna(-987654.0)
        .sort_values(by=list(pdf.columns), kind="mergesort")
        .reset_index(drop=True)
    )


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 10_000),
    st.sampled_from(["inner", "left", "outer"]),
    st.booleans(),
    st.booleans(),
    st.sampled_from(["on", "left_right_on"]),
)
def test_merge_fuzz_matches_pandas(spark, seed, how, null_keys, dup_keys, spec):
    left, right = _mk_frames(seed, null_keys, dup_keys)
    ll = lps.from_pandas(left, spark=spark)
    rr = lps.from_pandas(right, spark=spark)
    if spec == "on":
        want = left.merge(right, on="k", how=how)
        got = ll.merge(rr, on="k", how=how)
    else:
        want = left.merge(right, left_on="k", right_on="k", how=how)
        got = ll.merge(rr, left_on="k", right_on="k", how=how)
    got_pdf = got.to_pandas()
    assert sorted(got_pdf.columns) == sorted(want.columns), (
        got_pdf.columns,
        want.columns,
    )
    pd.testing.assert_frame_equal(
        _canon(got_pdf), _canon(want), check_dtype=False
    )


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000), st.sampled_from(["inner", "left"]))
def test_merge_custom_suffixes(spark, seed, how):
    left, right = _mk_frames(seed, False, True)
    ll = lps.from_pandas(left, spark=spark)
    rr = lps.from_pandas(right, spark=spark)
    want = left.merge(right, on="k", how=how, suffixes=("_a", "_b"))
    got = ll.merge(rr, on="k", how=how, suffixes=("_a", "_b")).to_pandas()
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)
