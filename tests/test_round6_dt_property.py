"""Round-6: hypothesis fuzz of the .dt accessor — random timestamps across
decades/leap-years/month boundaries, every extraction field plus floor and
strftime, differential vs real pandas (the one accessor family the round-5
sweep didn't fuzz)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps

_FIELDS = [
    "year",
    "month",
    "day",
    "hour",
    "minute",
    "second",
    "weekday",
    "quarter",
    "dayofyear",
    "days_in_month",
]
_FLAGS = ["is_month_start", "is_month_end"]


def _ts_series(seed, n=12):
    rng = np.random.RandomState(seed)
    # 1970..2035, second resolution; force month boundaries + leap day in
    secs = rng.randint(0, 2_050_000_000, size=n).astype("int64")
    s = pd.Series(pd.to_datetime(secs, unit="s"))
    s.iloc[0] = pd.Timestamp("2024-02-29 23:59:59")  # leap day
    s.iloc[1] = pd.Timestamp("1999-12-31 00:00:00")  # year boundary
    s.iloc[2] = pd.Timestamp("2000-03-01 12:00:00")  # post-leap month start
    return s


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000))
def test_dt_fields_match_pandas(spark, seed):
    ps = _ts_series(seed)
    s = lps.from_pandas(ps.to_frame("ts"), spark=spark)["ts"]
    for f in _FIELDS:
        got = getattr(s.dt, f).to_pandas().astype("int64").tolist()
        want = getattr(ps.dt, f).astype("int64").tolist()
        assert got == want, (f, got, want)
    for f in _FLAGS:
        got = getattr(s.dt, f).to_pandas().astype(bool).tolist()
        want = getattr(ps.dt, f).astype(bool).tolist()
        assert got == want, (f, got, want)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000), st.sampled_from(["D", "h", "min"]))
def test_dt_floor_matches_pandas(spark, seed, freq):
    ps = _ts_series(seed)
    s = lps.from_pandas(ps.to_frame("ts"), spark=spark)["ts"]
    got = s.dt.floor(freq).to_pandas().tolist()
    want = ps.dt.floor(freq).tolist()
    assert got == want, (freq, got, want)


@settings(max_examples=10, deadline=None)
@given(
    st.integers(0, 10_000),
    st.sampled_from(["%Y-%m-%d", "%Y/%m/%d %H:%M:%S", "%d %m %Y", "%H:%M"]),
)
def test_dt_strftime_matches_pandas(spark, seed, fmt):
    ps = _ts_series(seed)
    s = lps.from_pandas(ps.to_frame("ts"), spark=spark)["ts"]
    got = s.dt.strftime(fmt).to_pandas().tolist()
    want = ps.dt.strftime(fmt).tolist()
    assert got == want, (fmt, got, want)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000))
def test_dt_names_match_pandas(spark, seed):
    ps = _ts_series(seed)
    s = lps.from_pandas(ps.to_frame("ts"), spark=spark)["ts"]
    assert s.dt.month_name().to_pandas().tolist() == ps.dt.month_name().tolist()
    assert s.dt.day_name().to_pandas().tolist() == ps.dt.day_name().tolist()
    assert s.dt.normalize().to_pandas().tolist() == ps.dt.normalize().tolist()
