"""MultiIndex / index-level operations (reference core/index.py:650-803,
frontend/dataframe.py:1009-1119 set/reset_index, groupby(level=...))."""

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.RandomState(3)
    return pd.DataFrame(
        {
            "a": rng.randint(0, 3, 24),
            "b": [["x", "y"][i % 2] for i in range(24)],
            "v": rng.randn(24).round(4),
            "w": rng.randint(0, 100, 24).astype("int64"),
        }
    )


@pytest.fixture(scope="module")
def ldf(pdf, spark):
    return lps.from_pandas(pdf, spark=spark)


def test_set_index_multi_roundtrip(ldf, pdf):
    got = ldf.set_index(["a", "b"]).reset_index().to_pandas()
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    want = pdf.set_index(["a", "b"]).reset_index()
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_groupby_level(ldf, pdf):
    got = (
        ldf.set_index(["a", "b"]).groupby(level=0).agg({"v": "sum"}).reset_index().to_pandas()
    )
    want = pdf.set_index(["a", "b"]).groupby(level=0)["v"].sum().reset_index()
    got = got.sort_values("a").reset_index(drop=True)
    want = want.sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_groupby_level_name(ldf, pdf):
    got = (
        ldf.set_index(["a", "b"]).groupby(level="b").agg({"w": "max"}).reset_index().to_pandas()
    )
    want = pdf.set_index(["a", "b"]).groupby(level="b")["w"].max().reset_index()
    got = got.sort_values("b").reset_index(drop=True)
    want = want.sort_values("b").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_droplevel(ldf, pdf):
    got = ldf.set_index(["a", "b"]).droplevel(0)
    assert got.index_names == ("b",)
    assert "a" not in got.to_spark().columns


def test_reset_index_partial(ldf, pdf):
    got = ldf.set_index(["a", "b"]).reset_index(level=0)
    assert got.index_names == ("b",)
    assert "a" in got.columns


def test_multiindex_groupby_multiagg(ldf, pdf):
    got = (
        ldf.groupby(["a", "b"])
        .agg({"v": ["sum", "mean"], "w": "max"})
        .reset_index()
        .to_pandas()
    )
    want = pdf.groupby(["a", "b"]).agg({"v": ["sum", "mean"], "w": "max"})
    want.columns = ["v_sum", "v_mean", "w"]
    want = want.reset_index()
    key = ["a", "b"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sort_index_multi(ldf, pdf):
    got = ldf.set_index(["a", "b"]).sort_index().to_pandas().reset_index()
    want = pdf.set_index(["a", "b"]).sort_index().reset_index()
    assert list(got["a"]) == list(want["a"])
