"""Round-6 (late): hypothesis fuzz of resample, pivot_table, and interpolate
— differential vs real pandas over random timestamps/frequencies, random
pivot shapes with collisions, and random null runs (including leading/
trailing nulls, the interpolate edge cases)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


@settings(max_examples=12, deadline=None)
@given(st.integers(0, 10_000), st.sampled_from(["15min", "1h", "1D"]))
def test_resample_fuzz(spark, seed, freq):
    rng = np.random.RandomState(seed)
    n = 40
    ts = pd.to_datetime(rng.randint(0, 5 * 86400, n), unit="s")
    pdf = pd.DataFrame({"ts": ts, "v": rng.randn(n).round(3)})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = (
        ldf.resample(freq, on="ts")
        .sum()
        .to_pandas()
        .reset_index()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    want = (
        pdf.resample(freq, on="ts")["v"]
        .sum()
        .reset_index()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # pandas emits EMPTY buckets (sum 0) for gaps; Spark's window groupBy
    # only emits occupied buckets — compare on occupied buckets
    want = want[want["ts"].isin(set(got["ts"]))].reset_index(drop=True)
    assert got["ts"].tolist() == want["ts"].tolist()
    assert np.allclose(got["v"].values, want["v"].values, rtol=1e-9)


@settings(max_examples=12, deadline=None)
@given(
    st.integers(0, 10_000),
    st.sampled_from(["sum", "mean", "min", "max"]),
)
def test_pivot_table_fuzz(spark, seed, aggfunc):
    rng = np.random.RandomState(seed)
    n = 30
    pdf = pd.DataFrame(
        {
            "r": [f"r{x}" for x in rng.randint(0, 4, n)],
            "c": [f"c{x}" for x in rng.randint(0, 3, n)],
            "v": rng.randn(n).round(3),
        }
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = (
        ldf.pivot_table(values="v", index="r", columns="c", aggfunc=aggfunc)
        .to_pandas()
        .sort_index()
    )
    want = pdf.pivot_table(values="v", index="r", columns="c", aggfunc=aggfunc).sort_index()
    assert list(got.index) == list(want.index)
    for c in want.columns:
        assert np.allclose(
            got[c].values.astype(float),
            want[c].values.astype(float),
            rtol=1e-9,
            equal_nan=True,
        ), (aggfunc, c)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 3), st.integers(0, 3))
def test_interpolate_fuzz(spark, seed, lead_nulls, trail_nulls):
    rng = np.random.RandomState(seed)
    n = 20
    v = rng.randn(n).round(3)
    s = pd.Series(v)
    # random interior nulls + forced leading/trailing null runs
    s[rng.choice(range(4, n - 4), size=5, replace=False)] = np.nan
    for i in range(lead_nulls):
        s[i] = np.nan
    for i in range(trail_nulls):
        s[n - 1 - i] = np.nan
    ldf = lps.from_pandas(s.to_frame("v"), spark=spark)
    got = ldf["v"].interpolate().to_pandas()
    want = s.interpolate()
    assert np.allclose(
        got.values, want.values, rtol=1e-9, atol=1e-12, equal_nan=True
    ), (got.tolist(), want.tolist())


@settings(max_examples=12, deadline=None)
@given(st.integers(0, 10_000))
def test_get_dummies_fuzz(spark, seed):
    rng = np.random.RandomState(seed)
    n = 20
    pdf = pd.DataFrame(
        {
            "k": [f"k{x}" for x in rng.randint(0, 4, n)],
            "v": rng.randn(n).round(3),
        }
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.get_dummies(ldf, columns=["k"]).to_pandas().reset_index(drop=True)
    want = pd.get_dummies(pdf, columns=["k"]).reset_index(drop=True)
    assert sorted(got.columns) == sorted(want.columns)
    for c in want.columns:
        assert np.allclose(
            got[c].astype(float).values, want[c].astype(float).values, rtol=1e-9
        ), c


@settings(max_examples=12, deadline=None)
@given(st.integers(0, 10_000))
def test_crosstab_fuzz(spark, seed):
    rng = np.random.RandomState(seed)
    n = 25
    pdf = pd.DataFrame(
        {
            "a": [f"a{x}" for x in rng.randint(0, 3, n)],
            "b": [f"b{x}" for x in rng.randint(0, 4, n)],
        }
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.crosstab(ldf["a"], ldf["b"]).to_pandas().sort_index()
    want = pd.crosstab(pdf["a"], pdf["b"]).sort_index()
    assert list(got.index) == list(want.index)
    for c in want.columns:
        assert got[c].fillna(0).astype(int).tolist() == want[c].astype(int).tolist(), c
