"""Round-6 (late): hypothesis fuzz of top-k / positional-extremum /
duplicated — nlargest/nsmallest (ties), idxmax/idxmin, duplicated(keep=...)
and drop_duplicates, differential vs real pandas."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


def _pdf(seed, n=20):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "k": [f"k{x}" for x in rng.randint(0, 5, n)],
            "v": (rng.randint(0, 8, n) * 0.5),  # coarse grid → ties
            "u": np.arange(n, dtype="int64"),
        }
    )


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 8))
def test_nlargest_nsmallest_fuzz(spark, seed, n):
    pdf = _pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    # tie-break on the unique column so both engines pick identical rows
    got = ldf.nlargest(n, ["v", "u"]).to_pandas().reset_index(drop=True)
    want = pdf.nlargest(n, ["v", "u"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    got = ldf.nsmallest(n, ["v", "u"]).to_pandas().reset_index(drop=True)
    want = pdf.nsmallest(n, ["v", "u"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000))
def test_idxmax_idxmin_fuzz(spark, seed):
    rng = np.random.RandomState(seed)
    v = rng.permutation(20).astype("float64")  # unique → unambiguous argmax
    pdf = pd.DataFrame({"v": v})
    ldf = lps.from_pandas(pdf, spark=spark)
    assert ldf["v"].idxmax() == pdf["v"].idxmax()
    assert ldf["v"].idxmin() == pdf["v"].idxmin()


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.sampled_from(["first", "last", False]))
def test_duplicated_drop_duplicates_fuzz(spark, seed, keep):
    pdf = _pdf(seed)[["k", "v"]]
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.duplicated(keep=keep).to_pandas().astype(bool)
    want = pdf.duplicated(keep=keep)
    assert got.tolist() == want.tolist(), keep
    got_dd = (
        ldf.drop_duplicates(keep=keep)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want_dd = (
        pdf.drop_duplicates(keep=keep)
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_dd, want_dd, check_dtype=False)
