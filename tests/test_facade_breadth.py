"""Round-2 facade breadth: groupby transform/filter/apply/ewm/pct_change,
frame stack/unstack/pct_change/ewm/quantile, Series interpolate/mode/quantile.
All differential vs real pandas (the reference's own test strategy, SURVEY §5)."""

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


@pytest.fixture
def pdf():
    rng = np.random.RandomState(7)
    return pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 30),
            "x": rng.randint(0, 100, 30).astype("int64"),
            "y": rng.random(30) * 10,
        }
    )


def test_groupby_transform_sum(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").transform("sum").to_pandas()
    want = pdf.groupby("k")[["x", "y"]].transform("sum")
    pd.testing.assert_frame_equal(got[["x", "y"]], want, check_dtype=False)


def test_groupby_transform_mean_preserves_order(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").transform("mean").to_pandas()
    want = pdf.groupby("k")[["x", "y"]].transform("mean")
    pd.testing.assert_frame_equal(got[["x", "y"]], want, check_dtype=False)


def test_groupby_filter(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").filter(lambda g: g["x"].mean() > 40).to_pandas()
    want = pdf.groupby("k").filter(lambda g: g["x"].mean() > 40).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "x", "y"]].reset_index(drop=True), want, check_dtype=False
    )


def test_groupby_apply_frame_returning(spark, pdf):
    def top2(g):
        return g.nlargest(2, "x")[["x", "y"]]

    ldf = lps.from_pandas(pdf, spark=spark)
    got = (
        ldf.groupby("k")
        .apply(top2)
        .to_pandas()
        .reset_index()
        .sort_values(["k", "x", "y"])
        .reset_index(drop=True)
    )
    want = (
        pdf.groupby("k")[["k", "x", "y"]]
        .apply(lambda g: g.nlargest(2, "x")[["x", "y"]])
        .reset_index(level=0)
        .sort_values(["k", "x", "y"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "x", "y"]], want, check_dtype=False)


def test_groupby_pct_change(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").pct_change().to_pandas()
    want = pdf.groupby("k")[["x", "y"]].pct_change()
    pd.testing.assert_frame_equal(got[["x", "y"]], want, check_dtype=False)


def test_groupby_ewm_mean(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").ewm(alpha=0.3).mean().to_pandas()
    want = pdf.copy()
    for c in ("x", "y"):
        want[c] = pdf.groupby("k")[c].transform(
            lambda s: s.ewm(alpha=0.3, adjust=True).mean()
        )
    got = got.sort_values(["k", "x", "y"]).reset_index(drop=True)
    want = want.sort_values(["k", "x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "x", "y"]], want[["k", "x", "y"]], check_dtype=False)


def test_frame_ewm_mean_global(spark):
    pdf = pd.DataFrame({"v": [1.0, 3.0, 2.0, 8.0, 5.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.ewm(alpha=0.5).mean().to_pandas()
    want = pdf.ewm(alpha=0.5, adjust=True).mean()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_frame_pct_change(spark):
    pdf = pd.DataFrame({"v": [1.0, 2.0, 4.0, 3.0], "s": list("abcd")})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.pct_change().to_pandas()
    want = pdf.copy()
    want["v"] = pdf["v"].pct_change()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_series_pct_change(spark):
    pdf = pd.DataFrame({"v": [10.0, 20.0, 10.0, 40.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["v"].pct_change().to_pandas()
    pd.testing.assert_series_equal(
        got, pdf["v"].pct_change(), check_dtype=False, check_names=False
    )


def test_series_interpolate_linear(spark):
    pdf = pd.DataFrame({"v": [np.nan, 1.0, np.nan, np.nan, 7.0, np.nan, 2.0, np.nan]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["v"].interpolate().to_pandas()
    want = pdf["v"].interpolate()
    pd.testing.assert_series_equal(got, want, check_dtype=False, check_names=False)


def test_series_interpolate_all_null_prefix(spark):
    pdf = pd.DataFrame({"v": [np.nan, np.nan, 5.0, np.nan]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["v"].interpolate().to_pandas()
    want = pdf["v"].interpolate()
    pd.testing.assert_series_equal(got, want, check_dtype=False, check_names=False)


def test_series_quantile_and_mode(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    assert ldf["y"].quantile(0.5) == pytest.approx(pdf["y"].quantile(0.5))
    assert ldf["y"].quantile([0.25, 0.75]) == pytest.approx(
        list(pdf["y"].quantile([0.25, 0.75]))
    )
    modes = lps.Series(["a", "b", "a", "c", "b"], name="s").mode()
    pd.testing.assert_series_equal(
        modes, pd.Series(["a", "b"], name="s"), check_dtype=False
    )


def test_frame_quantile(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.quantile(0.5)
    want = pdf[["x", "y"]].quantile(0.5)
    pd.testing.assert_series_equal(got.astype(float), want, check_names=False)


def test_stack_matches_pandas(spark):
    pdf = pd.DataFrame(
        {"id": [1, 2], "a": [1.0, 3.0], "b": [2.0, 4.0]}
    ).set_index("id")
    ldf = lps.from_pandas(pdf.reset_index(), spark=spark).set_index("id")
    got = ldf.stack().to_pandas().reset_index()
    want = pdf.stack().rename("value").reset_index().rename(columns={"level_1": "variable"})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_unstack_matches_pandas(spark):
    pdf = pd.DataFrame(
        {
            "k1": ["x", "x", "y", "y"],
            "k2": ["p", "q", "p", "q"],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    ldf = lps.from_pandas(pdf, spark=spark).set_index(["k1", "k2"])
    got = ldf.unstack().to_pandas()
    want = pdf.set_index(["k1", "k2"])["v"].unstack()
    want.columns = [str(c) for c in want.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_names=False)


def test_series_groupby_transform_aligned(spark, pdf):
    ldf = lps.from_pandas(pdf, spark=spark)
    share = ldf["x"] / ldf.groupby("k")["x"].transform("sum")
    ldf["share"] = share
    got = ldf.to_pandas()["share"]
    want = pdf["x"] / pdf.groupby("k")["x"].transform("sum")
    pd.testing.assert_series_equal(got, want, check_dtype=False, check_names=False)
