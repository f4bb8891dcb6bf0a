"""Property-based differential tests (hypothesis): random small frames through
the facade must match real pandas for filter/arith/groupby/merge/sort — breadth
beyond the hand-written cases (reference relies on fixed random seeds; hypothesis
explores the space)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def small_frame(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    keys = draw(st.lists(st.integers(min_value=-3, max_value=3), min_size=n, max_size=n))
    ints = draw(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=n, max_size=n))
    floats = draw(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=64),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame(
        {"k": np.array(keys, dtype="int64"), "i": np.array(ints, dtype="int64"), "f": floats}
    )


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _cmp(lps_df, pdf):
    got = _sorted(lps_df.to_pandas())
    want = _sorted(pdf.reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-9, atol=1e-9)


@given(pdf=small_frame())
@settings(**_SETTINGS)
def test_filter_arith_roundtrip(spark, pdf):
    l = lps.from_pandas(pdf, spark=spark)
    got = l[l["i"] > 0]
    got["z"] = got["i"] * 2 - got["k"]
    want = pdf[pdf["i"] > 0].copy()
    want["z"] = want["i"] * 2 - want["k"]
    _cmp(got, want)


@given(pdf=small_frame())
@settings(**_SETTINGS)
def test_groupby_sum_count(spark, pdf):
    l = lps.from_pandas(pdf, spark=spark)
    got = l.groupby("k").agg({"i": "sum", "f": "count"}).reset_index()
    want = pdf.groupby("k").agg({"i": "sum", "f": "count"}).reset_index()
    _cmp(got, want)


@given(pdf=small_frame(), how=st.sampled_from(["inner", "left", "outer"]))
@settings(**_SETTINGS)
def test_merge_self_key(spark, pdf, how):
    right = pdf.groupby("k", as_index=False).agg(m=("i", "max"))
    l = lps.from_pandas(pdf, spark=spark)
    r = lps.from_pandas(right, spark=spark)
    got = l.merge(r, on="k", how=how)
    want = pdf.merge(right, on="k", how=how)
    _cmp(got, want)


@given(pdf=small_frame())
@settings(**_SETTINGS)
def test_sort_head_consistent(spark, pdf):
    l = lps.from_pandas(pdf, spark=spark)
    got = l.sort_values(["i", "k", "f"]).head(5).to_pandas().reset_index(drop=True)
    want = pdf.sort_values(["i", "k", "f"], kind="stable").head(5).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["i", "k"]], want[["i", "k"]], check_dtype=False
    )


@given(pdf=small_frame())
@settings(**_SETTINGS)
def test_dropna_fillna_roundtrip(spark, pdf):
    p = pdf.copy()
    p.loc[p["i"] % 3 == 0, "f"] = np.nan
    l = lps.from_pandas(p, spark=spark)
    _cmp(l.dropna(subset=["f"]), p.dropna(subset=["f"]))
    _cmp(l.fillna({"f": 0.0}), p.fillna({"f": 0.0}))


@st.composite
def frame_with_nulls(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    keys = draw(st.lists(st.integers(min_value=-2, max_value=2), min_size=n, max_size=n))
    vals = draw(
        st.lists(
            st.one_of(
                st.none(),
                st.floats(min_value=-50, max_value=50, allow_nan=False, width=64),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame(
        {"k": np.array(keys, dtype="int64"), "v": pd.array(vals, dtype="float64")}
    )


@given(pdf=frame_with_nulls())
@settings(**_SETTINGS)
def test_groupby_ffill_matches_pandas(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").ffill().to_pandas()["v"]
    want = pdf.groupby("k").ffill()["v"]
    pd.testing.assert_series_equal(got, want, check_names=False)


@given(pdf=frame_with_nulls())
@settings(**_SETTINGS)
def test_grouped_rank_matches_pandas(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k")["v"].rank(method="average").to_pandas()
    want = pdf.groupby("k")["v"].rank(method="average")
    pd.testing.assert_series_equal(got, want, check_names=False)


@given(pdf=frame_with_nulls())
@settings(**_SETTINGS)
def test_rolling_sum_matches_pandas(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf[["v"]].rolling(3).sum().to_pandas()["v"]
    want = pdf[["v"]].rolling(3).sum()["v"]
    pd.testing.assert_series_equal(got, want, check_names=False, rtol=1e-9)


@given(pdf=small_frame())
@settings(**_SETTINGS)
def test_global_rank_matches_pandas(spark, pdf):
    """Round-4 two-phase distributed rank across random frames/ties."""
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["i"].rank(method="average").to_pandas().reset_index(drop=True)
    want = pdf["i"].rank(method="average")
    pd.testing.assert_series_equal(got, want, check_names=False)


@given(pdf=small_frame())
@settings(**_SETTINGS)
def test_ewm_mean_matches_pandas(spark, pdf):
    """Round-4 exact distributed EWM across random frames."""
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["f"].ewm(alpha=0.35).mean().to_pandas().reset_index(drop=True)
    want = pdf["f"].ewm(alpha=0.35, adjust=True).mean()
    pd.testing.assert_series_equal(got, want, check_names=False)


@given(pdf=small_frame())
@settings(**_SETTINGS)
def test_expanding_var_matches_pandas(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf[["f"]].expanding().var().to_pandas().reset_index(drop=True)
    want = pdf[["f"]].expanding().var()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(pdf=frame_with_nulls(), alpha=st.floats(min_value=0.05, max_value=0.95))
@settings(**_SETTINGS)
def test_ewm_var_matches_pandas(spark, pdf, alpha):
    """Round-4 cont.: four-moment distributed ewm variance across random
    null patterns and alphas."""
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["v"].ewm(alpha=alpha).var().to_pandas().reset_index(drop=True)
    want = pdf["v"].ewm(alpha=alpha, adjust=True).var(bias=False)
    # compare only the numerically WELL-CONDITIONED region: >= 2 observations
    # (below that the variance is analytically undefined — we emit null) AND
    # a minimum pair-weight ratio b^(rows since first obs) >= 1e-6. Past that
    # the bias denominator (~2*min pair weight) sits below both engines'
    # rounding noise and pandas' own recursion flips between 0.0 and NaN —
    # float artifacts, not semantics (the deterministic tests cover moderate
    # alphas at depth).
    notna = pdf["v"].notna().to_numpy()
    cumobs = notna.cumsum()
    sel = cumobs >= 2
    if sel.any():
        first = int(np.argmax(notna))
        gap = np.arange(len(pdf)) - first
        sel &= np.power(1.0 - alpha, np.maximum(gap, 0)) >= 1e-6
    pd.testing.assert_series_equal(
        got[sel], want[sel], check_names=False, rtol=1e-8, atol=1e-10
    )


@given(pdf=frame_with_nulls())
@settings(**_SETTINGS)
def test_grouped_ewm_matches_pandas(spark, pdf):
    """Round-4 cont.: keyed two-phase grouped EWM across random key/null
    patterns."""
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").ewm(alpha=0.4).mean().to_pandas()
    want = pdf.groupby("k")["v"].transform(
        lambda s: s.ewm(alpha=0.4, adjust=True).mean()
    )
    # atol floors out subnormal-float pathologies (5e-324-scale inputs round
    # differently through the num/den reconstruction than through pandas'
    # recursive form — measure-zero noise, not semantics)
    np.testing.assert_allclose(
        got["v"].to_numpy(), want.to_numpy(), rtol=1e-9, atol=1e-12, equal_nan=True
    )
