"""Round-5 breadth: Series.str.findall, DataFrame.mode, and a
groupby.rolling.apply differential (the three pandas-API stragglers from the
round-4 verdict) — all differential vs real pandas."""

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


def test_str_findall_no_groups(spark):
    pdf = pd.DataFrame({"s": ["a1b22c333", "nope", "x9", ""]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["s"].str.findall(r"\d+").to_pandas().tolist()
    want = pdf["s"].str.findall(r"\d+").tolist()
    assert [list(g) for g in got] == want


def test_str_findall_one_group(spark):
    pdf = pd.DataFrame({"s": ["a=1,b=2", "c=3", "none"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["s"].str.findall(r"(\d)").to_pandas().tolist()
    want = pdf["s"].str.findall(r"(\d)").tolist()
    assert [list(g) for g in got] == want


def test_str_findall_multigroup_raises(spark):
    pdf = pd.DataFrame({"s": ["a=1"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    with pytest.raises(NotImplementedError):
        ldf["s"].str.findall(r"(\w)=(\d)")


def test_frame_mode_matches_pandas(spark):
    pdf = pd.DataFrame(
        {
            "a": [1, 2, 2, 3, 3],
            "b": ["x", "x", "y", "z", "z"],
            "c": [1.5, 1.5, 1.5, 2.5, 9.0],
        }
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.mode().to_pandas().reset_index(drop=True)
    want = pdf.mode().reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        g = got[c].fillna("__na__").tolist()
        w = want[c].fillna("__na__").tolist()
        assert g == w, (c, g, w)


def test_frame_mode_numeric_only(spark):
    pdf = pd.DataFrame({"a": [1, 1, 2], "s": ["x", "y", "y"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.mode(numeric_only=True).to_pandas().reset_index(drop=True)
    want = pdf.mode(numeric_only=True).reset_index(drop=True)
    assert list(got.columns) == ["a"]
    assert got["a"].tolist() == want["a"].tolist()


def test_groupby_rolling_apply_matches_pandas(spark):
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "k": [i % 3 for i in range(60)],
            "v": rng.randn(60),
        }
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    fn = lambda x: x.max() - x.min()  # noqa: E731
    got = (
        ldf.groupby("k")
        .rolling(4, min_periods=2)
        .apply(fn)
        .to_pandas()
        .sort_values(["k", "v"], na_position="first")["v"]
        .reset_index(drop=True)
    )
    want = (
        pdf.groupby("k")
        .rolling(4, min_periods=2)
        .apply(fn)
        .reset_index()
        .sort_values(["k", "v"], na_position="first")["v"]
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got, want, check_dtype=False)
