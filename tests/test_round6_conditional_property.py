"""Round-6 (late): hypothesis fuzz of the conditional-replacement family —
where/mask (scalar and series other), clip (one/both bounds), and replace
(scalar and dict) — differential vs real pandas with random null patterns."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


def _pdf(seed, n=20):
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame(
        {
            "a": rng.randn(n).round(3),
            "b": rng.randint(-5, 6, n).astype("float64"),
        }
    )
    pdf.loc[rng.choice(n, 3, replace=False), "a"] = np.nan
    return pdf


def _close(got, want):
    assert np.allclose(
        got.astype(float).values, want.astype(float).values,
        rtol=1e-9, atol=1e-12, equal_nan=True,
    ), (got.tolist(), want.tolist())


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.floats(-2, 2), st.booleans())
def test_where_mask_fuzz(spark, seed, threshold, use_other):
    pdf = _pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    other = -99.0 if use_other else None
    kw = {} if other is None else {"other": other}
    got = ldf["a"].where(ldf["b"] > threshold, **kw).to_pandas()
    want = pdf["a"].where(pdf["b"] > threshold, **kw)
    _close(got, want)
    got = ldf["a"].mask(ldf["b"] > threshold, **kw).to_pandas()
    want = pdf["a"].mask(pdf["b"] > threshold, **kw)
    _close(got, want)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(0, 10_000),
    st.one_of(st.none(), st.floats(-1, 0)),
    st.one_of(st.none(), st.floats(0, 1)),
)
def test_clip_fuzz(spark, seed, lo, hi):
    pdf = _pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["a"].clip(lower=lo, upper=hi).to_pandas()
    want = pdf["a"].clip(lower=lo, upper=hi)
    _close(got, want)
    got = ldf.clip(lower=lo, upper=hi).to_pandas().reset_index(drop=True)
    want = pdf.clip(lower=lo, upper=hi).reset_index(drop=True)
    for c in ("a", "b"):
        _close(got[c], want[c])


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.integers(-5, 5), st.integers(-5, 5))
def test_replace_fuzz(spark, seed, old, new):
    pdf = _pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.replace(float(old), float(new)).to_pandas().reset_index(drop=True)
    want = pdf.replace(float(old), float(new)).reset_index(drop=True)
    for c in ("a", "b"):
        _close(got[c], want[c])
    mapping = {float(old): float(new), 2.0: -7.0}
    got = ldf.replace(mapping).to_pandas().reset_index(drop=True)
    want = pdf.replace(mapping).reset_index(drop=True)
    for c in ("a", "b"):
        _close(got[c], want[c])
