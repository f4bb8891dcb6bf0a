"""Round-6: hypothesis fuzz of groupby.transform (window broadcast-back) and
cut/qcut binning — differential vs real pandas over random groups/values/null
patterns and random bin counts/edges."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


def _pdf(seed, with_nulls, n=20):
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame(
        {
            "g": [f"g{x}" for x in rng.randint(0, 4, n)],
            "v": rng.randn(n).round(3),
        }
    )
    if with_nulls:
        pdf.loc[3, "g"] = None
        pdf.loc[5, "v"] = np.nan
    return pdf


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 10_000),
    st.sampled_from(["sum", "mean", "min", "max", "count"]),
    st.booleans(),
)
def test_groupby_transform_fuzz(spark, seed, op, with_nulls):
    pdf = _pdf(seed, with_nulls)
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("g").transform(op)["v"].to_pandas()
    want = pdf.groupby("g")["v"].transform(op)
    # distributed sums reduce in a different order than pandas — compare to
    # float tolerance, exact on null positions
    import math

    assert len(got) == len(want)
    for g_, w_ in zip(got.tolist(), want.tolist()):
        if w_ is None or (isinstance(w_, float) and math.isnan(w_)):
            assert g_ is None or (isinstance(g_, float) and math.isnan(g_)), (op, g_, w_)
        else:
            assert abs(g_ - w_) <= 1e-9 + 1e-9 * abs(w_), (op, g_, w_)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10_000), st.integers(2, 8), st.booleans())
def test_cut_int_bins_fuzz(spark, seed, bins, right):
    pdf = _pdf(seed, False)
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.cut(ldf["v"], bins, labels=False, right=right).to_pandas()
    want = pd.cut(pdf["v"], bins, labels=False, right=right)
    assert got.fillna(-1).astype(int).tolist() == want.fillna(-1).astype(int).tolist()


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.integers(2, 6))
def test_qcut_fuzz(spark, seed, q):
    # unique-ish values so quantile edges are strictly increasing (pandas
    # raises on duplicate edges without duplicates='drop'; same contract here)
    rng = np.random.RandomState(seed)
    vals = np.sort(rng.randn(25).round(6))
    vals = vals + np.arange(25) * 1e-3  # force uniqueness
    pdf = pd.DataFrame({"v": rng.permutation(vals)})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.qcut(ldf["v"], q, labels=False).to_pandas()
    want, edges = pd.qcut(pdf["v"], q, labels=False, retbins=True)
    # pandas' interpolated quantile can land a hair below an exact data point
    # (24*(2/3) = 15.999999999999998) where Spark's percentile hits it
    # exactly — a value AT an edge may legitimately fall either side. Only
    # assert bucket equality away from the edges.
    for v, g_, w_ in zip(pdf["v"], got.astype(int), want.astype(int)):
        if min(abs(v - e) for e in edges) > 1e-9:
            assert g_ == w_, (v, g_, w_, edges)
