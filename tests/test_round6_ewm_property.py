"""Round-6: hypothesis fuzz of the exact distributed EWM recurrence and
expanding windows — random values/nulls/alphas vs real pandas (the two-phase
num/den + geometric-decay-carry formulation must be exact, not approximate,
for ANY partition split)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


def _series(seed, with_nulls, n=30):
    rng = np.random.RandomState(seed)
    v = rng.randn(n).round(4)
    s = pd.Series(v)
    if with_nulls:
        s[rng.choice(n, size=4, replace=False)] = np.nan
    return s


@settings(max_examples=15, deadline=None)
@given(
    st.integers(0, 10_000),
    st.floats(0.05, 0.95),
    st.booleans(),
)
def test_ewm_mean_fuzz(spark, seed, alpha, with_nulls):
    ps = _series(seed, with_nulls)
    ldf = lps.from_pandas(ps.to_frame("v"), spark=spark)
    got = ldf.ewm(alpha=alpha).mean().to_pandas()["v"]
    want = ps.ewm(alpha=alpha).mean()
    assert np.allclose(got.values, want.values, rtol=1e-9, atol=1e-12, equal_nan=True)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000), st.floats(0.1, 0.9))
def test_ewm_var_std_fuzz(spark, seed, alpha):
    ps = _series(seed, False)
    ldf = lps.from_pandas(ps.to_frame("v"), spark=spark)
    got_v = ldf.ewm(alpha=alpha).var().to_pandas()["v"]
    want_v = ps.ewm(alpha=alpha).var()
    assert np.allclose(
        got_v.values, want_v.values, rtol=1e-8, atol=1e-10, equal_nan=True
    )
    got_s = ldf.ewm(alpha=alpha).std().to_pandas()["v"]
    want_s = ps.ewm(alpha=alpha).std()
    assert np.allclose(
        got_s.values, want_s.values, rtol=1e-8, atol=1e-10, equal_nan=True
    )


@settings(max_examples=12, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 5), st.booleans())
def test_expanding_fuzz(spark, seed, min_periods, with_nulls):
    ps = _series(seed, with_nulls)
    ldf = lps.from_pandas(ps.to_frame("v"), spark=spark)
    for op in ("sum", "mean", "min", "max"):
        got = getattr(ldf.expanding(min_periods=min_periods), op)().to_pandas()["v"]
        want = getattr(ps.expanding(min_periods=min_periods), op)()
        assert np.allclose(
            got.values, want.values, rtol=1e-9, atol=1e-12, equal_nan=True
        ), op
