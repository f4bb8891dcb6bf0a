"""Round-6: hypothesis fuzz of the indexing surface — iloc slices (positive/
negative bounds/steps-of-1, OOB clamping), loc label slices and lists on a
stored index, head/tail, and loc mask-scatter writes — differential vs real
pandas. The last major frontend family without a property sweep."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


def _pdf(seed, n=12):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "k": np.arange(n, dtype="int64") * 10,
            "v": rng.randn(n).round(3),
            "s": [f"s{i % 4}" for i in range(n)],
        }
    )


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 10_000),
    st.one_of(st.none(), st.integers(-15, 15)),
    st.one_of(st.none(), st.integers(-15, 15)),
)
def test_iloc_slice_fuzz(spark, seed, start, stop):
    pdf = _pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.iloc[start:stop].to_pandas().reset_index(drop=True)
    want = pdf.iloc[start:stop].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 13), st.integers(0, 13))
def test_head_tail_fuzz(spark, seed, h, t):
    pdf = _pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    pd.testing.assert_frame_equal(
        ldf.head(h).to_pandas().reset_index(drop=True),
        pdf.head(h).reset_index(drop=True),
        check_dtype=False,
    )
    pd.testing.assert_frame_equal(
        ldf.tail(t).to_pandas().reset_index(drop=True),
        pdf.tail(t).reset_index(drop=True),
        check_dtype=False,
    )


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 10_000),
    st.one_of(st.none(), st.integers(-20, 130)),
    st.one_of(st.none(), st.integers(-20, 130)),
)
def test_loc_label_slice_fuzz(spark, seed, lo, hi):
    pdf = _pdf(seed).set_index("k")
    ldf = lps.from_pandas(_pdf(seed), spark=spark).set_index("k")
    got = ldf.loc[lo:hi].to_pandas()
    want = pdf.loc[lo:hi]
    assert got.index.tolist() == want.index.tolist()
    assert got["v"].tolist() == want["v"].tolist()


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.lists(st.integers(0, 11), min_size=0, max_size=5, unique=True))
def test_loc_label_list_fuzz(spark, seed, picks):
    labels = [p * 10 for p in picks]
    pdf = _pdf(seed).set_index("k")
    ldf = lps.from_pandas(_pdf(seed), spark=spark).set_index("k")
    got = ldf.loc[labels].to_pandas()
    want = pdf.loc[pdf.index.intersection(labels)]
    assert sorted(got.index.tolist()) == sorted(want.index.tolist())


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.floats(-1.0, 1.0), st.integers(-100, 100))
def test_loc_mask_scatter_write_fuzz(spark, seed, threshold, newval):
    pdf = _pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    expect = pdf.copy()
    expect.loc[expect["v"] > threshold, "v"] = float(newval)
    ldf.loc[ldf["v"] > threshold, "v"] = float(newval)
    got = ldf.to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect.reset_index(drop=True), check_dtype=False)
