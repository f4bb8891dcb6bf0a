"""get_dummies / cut / qcut — differential vs real pandas (extension surface;
the reference's closest machinery is the categorical dictionary column,
core/column.py:831-911, which get_dummies reuses for declared categories)."""

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


def test_get_dummies_frame(spark):
    pdf = pd.DataFrame({"k": [1, 2, 3, 4], "color": ["red", "blue", "red", "green"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.get_dummies(ldf, columns=["color"]).to_pandas().sort_values("k").reset_index(drop=True)
    want = pd.get_dummies(pdf, columns=["color"], dtype="int8")
    pd.testing.assert_frame_equal(got[list(want.columns)], want, check_dtype=False)


def test_get_dummies_declared_categories(spark):
    pdf = pd.DataFrame({"k": [1, 2], "c": pd.Categorical(["a", "b"], categories=["a", "b", "z"])})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.get_dummies(ldf, columns=["c"]).to_pandas().sort_values("k").reset_index(drop=True)
    want = pd.get_dummies(pdf, columns=["c"], dtype="int8")
    # declared-but-unseen category 'z' must appear as an all-zero column
    assert "c_z" in got.columns
    pd.testing.assert_frame_equal(got[list(want.columns)], want, check_dtype=False)


def test_get_dummies_series(spark):
    s = lps.Series(["x", "y", "x"], name="s")
    got = lps.get_dummies(s).to_pandas()
    assert sorted(got.columns) == ["s_x", "s_y"]
    assert int(got["s_x"].sum()) == 2 and int(got["s_y"].sum()) == 1


@pytest.mark.parametrize("right", [True, False])
def test_cut_explicit_edges(spark, right):
    vals = [1.0, 5.0, 10.0, 15.0, 20.0, 3.0, 7.5, 10.0]
    pdf = pd.DataFrame({"v": vals})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.cut(ldf["v"], [0, 5, 10, 20], labels=False, right=right).to_pandas()
    want = pd.cut(pdf["v"], [0, 5, 10, 20], labels=False, right=right)
    assert sorted(got.fillna(-1)) == sorted(pd.Series(want).fillna(-1))


def test_cut_int_bins(spark):
    rng = np.random.RandomState(3)
    vals = rng.random(200) * 100
    pdf = pd.DataFrame({"v": vals})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = np.sort(lps.cut(ldf["v"], 4, labels=False).to_pandas().to_numpy())
    want = np.sort(pd.cut(pdf["v"], 4, labels=False).to_numpy())
    assert np.array_equal(got, want)


def test_cut_labels(spark):
    pdf = pd.DataFrame({"v": [1.0, 6.0, 15.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = sorted(lps.cut(ldf["v"], [0, 5, 10, 20], labels=["lo", "mid", "hi"]).to_pandas())
    assert got == ["hi", "lo", "mid"]


def test_qcut_quartiles(spark):
    rng = np.random.RandomState(11)
    vals = rng.random(400)
    pdf = pd.DataFrame({"v": vals})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = np.sort(lps.qcut(ldf["v"], 4, labels=False).to_pandas().to_numpy())
    want = np.sort(pd.qcut(pdf["v"], 4, labels=False).to_numpy())
    assert np.array_equal(got, want)
