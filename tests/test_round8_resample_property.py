"""Round-8 fuzz: resample / interpolate / pivot_table differential vs pandas
(the last un-fuzzed facade families from the round-6/7 wishlists).

Resample parity is compared on NON-EMPTY buckets: Spark's groupBy(window)
only emits observed windows, while pandas materializes the full bucket
range (documented divergence — gap buckets need a date-spine join, which is
the date_spine_gap_fill catalog query's job).
"""
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from legate_pandas_spark.frontend.frame import from_pandas

_floats = st.one_of(
    st.none(), st.floats(min_value=-100, max_value=100, allow_nan=False)
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=st.lists(_floats, min_size=1, max_size=20))
def test_series_interpolate_matches_pandas(spark, vals):
    pdf = pd.DataFrame({"v": pd.array(vals, dtype="float64")})
    exp = pdf["v"].interpolate().tolist()
    got = from_pandas(pdf, spark=spark)["v"].interpolate().to_pandas().tolist()
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        if pd.isna(e):
            assert pd.isna(g), (got, exp)
        else:
            assert abs(g - e) < 1e-9, (got, exp)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(_floats, min_size=1, max_size=16),
    vals2=st.lists(_floats, min_size=1, max_size=16),
)
def test_frame_interpolate_matches_pandas(spark, vals, vals2):
    n = min(len(vals), len(vals2))
    pdf = pd.DataFrame(
        {
            "a": pd.array(vals[:n], dtype="float64"),
            "b": pd.array(vals2[:n], dtype="float64"),
        }
    )
    exp = pdf.interpolate()
    got = from_pandas(pdf, spark=spark).interpolate().to_pandas()
    for c in ["a", "b"]:
        for g, e in zip(got[c], exp[c]):
            if pd.isna(e):
                assert pd.isna(g)
            else:
                assert abs(g - e) < 1e-9


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    minutes=st.lists(st.integers(0, 60 * 48), min_size=1, max_size=25),
    freq=st.sampled_from(["1h", "15min", "1D", "30min"]),
    how=st.sampled_from(["sum", "mean", "count", "min", "max"]),
)
def test_resample_matches_pandas_nonempty_buckets(spark, minutes, freq, how):
    base = pd.Timestamp("2024-03-01")
    pdf = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(minutes=m) for m in minutes],
            "v": np.arange(len(minutes), dtype="float64"),
        }
    )
    exp = getattr(pdf.resample(freq, on="ts"), how)()
    # pandas materializes EMPTY buckets (sum -> 0.0, count -> 0); Spark's
    # groupBy(window) emits observed windows only — compare non-empty ones
    nonempty = pdf.resample(freq, on="ts").count()["v"] > 0
    exp = exp[nonempty]
    got = (
        getattr(from_pandas(pdf, spark=spark).resample(freq, on="ts"), how)()
        .to_pandas()
        .reset_index()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp), (got, exp)
    for (g_ts, g_v), (e_ts, e_v) in zip(
        zip(got["ts"], got["v"]), zip(exp.index, exp["v"])
    ):
        assert pd.Timestamp(g_ts) == e_ts, (got, exp)
        assert abs(g_v - e_v) < 1e-9, (got, exp)


_cats = st.sampled_from(["x", "y", "z"])


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), _cats, st.floats(-50, 50, allow_nan=False)),
        min_size=1,
        max_size=20,
    ),
    aggfunc=st.sampled_from(["sum", "mean", "count", "min", "max"]),
)
def test_pivot_table_matches_pandas(spark, rows, aggfunc):
    pdf = pd.DataFrame(rows, columns=["k", "c", "v"])
    exp = pdf.pivot_table(index="k", columns="c", values="v", aggfunc=aggfunc)
    got = (
        from_pandas(pdf, spark=spark)
        .pivot_table(index="k", columns="c", values="v", aggfunc=aggfunc)
        .to_pandas()
        .reset_index()
        .sort_values("k")
        .set_index("k")
    )
    assert sorted(got.columns) == sorted(exp.columns)
    assert list(got.index) == list(exp.index)
    for c in exp.columns:
        for g, e in zip(got[c], exp[c]):
            if pd.isna(e):
                assert pd.isna(g), (c, got, exp)
            else:
                assert abs(g - e) < 1e-9, (c, got, exp)
