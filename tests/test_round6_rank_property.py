"""Round-6 (late): hypothesis fuzz of the range-bucketed two-phase
distributed Series.rank — methods x ascending x pct x ties x nulls vs real
pandas (the most intricate scan-machinery consumer after ewm)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 10_000),
    st.sampled_from(["min", "max", "dense", "first", "average"]),
    st.booleans(),
    st.booleans(),
    st.booleans(),
)
def test_rank_fuzz(spark, seed, method, ascending, pct, with_nulls):
    rng = np.random.RandomState(seed)
    n = 25
    # coarse grid forces plenty of ties
    v = (rng.randint(0, 6, n) * 0.5).astype("float64")
    s = pd.Series(v)
    if with_nulls:
        s[rng.choice(n, 4, replace=False)] = np.nan
    ldf = lps.from_pandas(s.to_frame("v"), spark=spark)
    got = ldf["v"].rank(method=method, ascending=ascending, pct=pct).to_pandas()
    want = s.rank(method=method, ascending=ascending, pct=pct)
    assert np.allclose(
        got.values, want.values, rtol=1e-9, atol=1e-12, equal_nan=True
    ), (method, ascending, pct, got.tolist(), want.tolist())
