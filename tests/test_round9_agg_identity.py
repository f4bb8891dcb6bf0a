"""Empty-after-skipna aggregate identities (hypothesis-found via the
groupby-transform fuzz, seed 8352): pandas reduces with skipna and returns
the IDENTITY for a group/series whose values are all NaN — sum 0, prod 1,
any False, all True — where Spark's aggregates return NULL. Differential
coverage for every reduction surface: groupby.agg, groupby.transform,
Series reductions, Series.agg, frame-wide reductions, frame.agg."""

import numpy as np
import pandas as pd

import legate_pandas_spark as lps


def _frames(spark):
    # group 'a' is all-NaN; row 3 has a null KEY (transform must emit NaN)
    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "b", None, "b"],
            "v": [np.nan, np.nan, 1.5, 2.0, np.nan],
        }
    )
    return lps.from_pandas(pdf, spark=spark), pdf


def test_groupby_agg_identities(spark):
    ldf, pdf = _frames(spark)
    for op in ["sum", "prod", "any", "all"]:
        got = ldf.groupby("g").agg({"v": op}).to_pandas()["v"].sort_index()
        want = pdf.groupby("g")["v"].agg(op).sort_index()
        assert got.tolist() == want.tolist(), (op, got.tolist(), want.tolist())
    # identity must NOT leak into null-preserving reductions
    got = ldf.groupby("g").agg({"v": "min"}).to_pandas()["v"].sort_index()
    assert np.isnan(got["a"]) and got["b"] == 1.5


def test_groupby_transform_identities(spark):
    ldf, pdf = _frames(spark)
    for op in ["sum", "count"]:
        got = ldf.groupby("g").transform(op)["v"].to_pandas().reset_index(drop=True)
        want = pdf.groupby("g")["v"].transform(op)
        for g_, w_ in zip(got.tolist(), want.tolist()):
            if isinstance(w_, float) and np.isnan(w_):
                assert g_ is None or (isinstance(g_, float) and np.isnan(g_)), op
            else:
                assert g_ == w_, (op, g_, w_)
    # series-level transform path shares the fix
    got = ldf.groupby("g")["v"].transform("sum").to_pandas().reset_index(drop=True)
    want = pdf.groupby("g")["v"].transform("sum")
    assert got.fillna(-9).tolist() == want.fillna(-9).tolist()


def test_series_and_frame_reduction_identities(spark):
    allnan = lps.from_pandas(pd.DataFrame({"v": [np.nan, np.nan]}), spark=spark)
    p = pd.Series([np.nan, np.nan])
    assert allnan["v"].sum() == p.sum() == 0.0
    assert allnan["v"].prod() == p.prod() == 1.0
    assert allnan["v"].any() == bool(p.any()) == False  # noqa: E712
    assert allnan["v"].all() == bool(p.all()) == True  # noqa: E712
    assert allnan["v"].min() is None  # pandas NaN — null-preserving stays null
    agg = allnan["v"].agg(["sum", "prod", "min"])
    assert agg["sum"] == 0.0 and agg["prod"] == 1.0 and np.isnan(agg["min"])
    fsum = allnan.sum()
    assert fsum["v"] == 0.0
    assert allnan.prod()["v"] == 1.0
    assert allnan.any()["v"] is np.False_ or allnan.any()["v"] == False  # noqa: E712
    assert allnan.all()["v"] is np.True_ or allnan.all()["v"] == True  # noqa: E712
    fagg = allnan.agg({"v": ["sum", "prod", "max"]})
    assert fagg["v"]["sum"] == 0.0 and fagg["v"]["prod"] == 1.0
    assert fagg["v"]["max"] is None or np.isnan(fagg["v"]["max"])


def test_pivot_identity_vs_missing_combo(spark):
    """A (key, pivot-value) combo WITH all-NaN rows sums to 0 (pandas
    identity); a combo with NO rows stays null (pandas NaN) — the identity
    applies inside the aggregate, never to absent cells."""
    pdf = pd.DataFrame(
        {
            "k": ["x", "x", "y"],
            "p": ["l", "r", "l"],
            "v": [np.nan, 1.0, 2.0],
        }
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = (
        ldf.groupby("k")
        .pivot("p", ["l", "r"])
        .agg({"v": "sum"})
        .to_pandas()
        .sort_index()
    )
    want = pdf.pivot_table(index="k", columns="p", values="v", aggfunc="sum")
    assert got.loc["x", "l"] == 0.0  # all-NaN combo -> identity
    assert got.loc["y", "l"] == 2.0
    assert pd.isna(got.loc["y", "r"]) and pd.isna(want.loc["y", "r"])  # absent
