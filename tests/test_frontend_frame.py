"""Frontend facade differential tests against real pandas — the reference's own
test strategy (SURVEY §5: small frames, run both, compare; e.g.
reference tests/pandas/df_merge.py sorts before comparing because join order is
undefined, README.md:188)."""

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.RandomState(42)
    return pd.DataFrame(
        {
            "k1": rng.randint(0, 5, 40),
            "k2": rng.choice(["AA", "BB", "CC", "DD"], 40),
            "v_int": rng.randint(-100, 100, 40).astype("int64"),
            "v_float": rng.randn(40),
            "v_str": [f"s{i:03d}" for i in range(40)],
        }
    )


@pytest.fixture(scope="module")
def ldf(pdf, spark):
    return lps.from_pandas(pdf, spark=spark)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def assert_frames_match(lps_df, pandas_df):
    got = _sorted(lps_df.to_pandas().reset_index(drop=True) if hasattr(lps_df, "to_pandas") else lps_df)
    want = _sorted(pandas_df.reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-9)


def test_filter_mask(ldf, pdf):
    assert_frames_match(ldf[ldf["v_int"] > 0], pdf[pdf["v_int"] > 0])


def test_projection(ldf, pdf):
    assert_frames_match(ldf[["k1", "v_float"]], pdf[["k1", "v_float"]])


def test_assign_arith(ldf, pdf):
    got = ldf.copy()
    got["z"] = got["v_int"] * 2 + 1
    want = pdf.copy()
    want["z"] = want["v_int"] * 2 + 1
    assert_frames_match(got, want)


def test_truediv_promotion(ldf, pdf):
    got = ldf.copy()
    got["d"] = got["v_int"] / 7
    want = pdf.copy()
    want["d"] = want["v_int"] / 7
    assert_frames_match(got, want)


def test_query_expr(ldf, pdf):
    assert_frames_match(
        ldf.query("v_int > 0 and k1 != 2"), pdf.query("v_int > 0 and k1 != 2")
    )


def test_query_external_ref(ldf, pdf):
    lim = 10
    assert_frames_match(ldf.query("v_int > @lim", lim=lim), pdf.query("v_int > @lim"))


def test_groupby_sum(ldf, pdf):
    got = ldf.groupby("k1").agg({"v_int": "sum", "v_float": "mean"}).reset_index()
    want = pdf.groupby("k1").agg({"v_int": "sum", "v_float": "mean"}).reset_index()
    assert_frames_match(got, want)


def test_groupby_multi_agg_naming(ldf, pdf):
    got = ldf.groupby("k2").agg({"v_int": ["sum", "max"]}).reset_index()
    want = pdf.groupby("k2").agg({"v_int": ["sum", "max"]})
    want.columns = ["v_int_sum", "v_int_max"]
    want = want.reset_index()
    assert_frames_match(got, want)


def test_groupby_size(ldf, pdf):
    got = ldf.groupby("k2").size().reset_index()
    want = pdf.groupby("k2").size().rename("size").reset_index()
    assert_frames_match(got, want)


def test_merge_inner_suffixes(ldf, pdf, spark):
    right_pdf = pd.DataFrame(
        {"k1": [0, 1, 2, 3, 4], "v_int": [10, 20, 30, 40, 50], "extra": list("abcde")}
    )
    right = lps.from_pandas(right_pdf, spark=spark)
    got = ldf.merge(right, on="k1")
    want = pdf.merge(right_pdf, on="k1")
    assert sorted(got.columns) == sorted(want.columns)  # _x/_y suffixing
    assert_frames_match(got, want)


def test_merge_left_on_right_on(ldf, pdf, spark):
    right_pdf = pd.DataFrame({"kk": [0, 1, 2], "w": [1.5, 2.5, 3.5]})
    right = lps.from_pandas(right_pdf, spark=spark)
    got = ldf.merge(right, left_on="k1", right_on="kk", how="left")
    want = pdf.merge(right_pdf, left_on="k1", right_on="kk", how="left")
    assert_frames_match(got, want)


def test_merge_outer_coalesce(spark):
    a = pd.DataFrame({"k": [1, 2, 3], "x": [1.0, 2.0, 3.0]})
    b = pd.DataFrame({"k": [2, 3, 4], "y": [20.0, 30.0, 40.0]})
    got = lps.from_pandas(a, spark=spark).merge(lps.from_pandas(b, spark=spark), on="k", how="outer")
    want = a.merge(b, on="k", how="outer")
    assert_frames_match(got, want)


def test_merge_right_extension(spark):
    a = pd.DataFrame({"k": [1, 2, 3], "x": [1.0, 2.0, 3.0]})
    b = pd.DataFrame({"k": [2, 3, 4], "y": [20.0, 30.0, 40.0]})
    got = lps.from_pandas(a, spark=spark).merge(lps.from_pandas(b, spark=spark), on="k", how="right")
    want = a.merge(b, on="k", how="right")
    assert_frames_match(got, want)


def test_sort_values_head(ldf, pdf):
    got = ldf.sort_values(["v_int", "v_str"], ascending=[False, True]).head(10)
    want = pdf.sort_values(["v_int", "v_str"], ascending=[False, True]).head(10)
    assert_frames_match(got, want)


def test_drop_duplicates_subset(ldf, pdf):
    got = ldf.drop_duplicates(subset=["k1"], keep="first")
    # keep='first' depends on row order: compare the chosen v_str set per key
    want = pdf.drop_duplicates(subset=["k1"], keep="first")
    assert len(got) == len(want)
    assert sorted(got.to_pandas()["k1"]) == sorted(want["k1"])


def test_dropna_fillna(spark):
    p = pd.DataFrame({"a": [1.0, None, 3.0, None], "b": ["x", "y", None, None]})
    l = lps.from_pandas(p, spark=spark)
    assert_frames_match(l.dropna(), p.dropna())
    assert_frames_match(l.dropna(subset=["a"]), p.dropna(subset=["a"]))
    assert_frames_match(l.dropna(thresh=1), p.dropna(thresh=1))
    assert_frames_match(l.fillna({"a": -1.0, "b": "zz"}), p.fillna({"a": -1.0, "b": "zz"}))


def test_isna_where_mask(spark):
    p = pd.DataFrame({"a": [1.0, None, 3.0], "b": [10.0, 20.0, 30.0]})
    l = lps.from_pandas(p, spark=spark)
    assert_frames_match(l.isna(), p.isna())
    got = l.copy()
    got["c"] = got["b"].mask(got["b"] > 15, -1.0)
    want = p.copy()
    want["c"] = want["b"].mask(want["b"] > 15, -1.0)
    assert_frames_match(got, want)


def test_astype(ldf, pdf):
    got = ldf.astype({"v_int": "float64"})
    want = pdf.astype({"v_int": "float64"})
    assert_frames_match(got, want)


def test_str_accessor(ldf, pdf):
    got = ldf.copy()
    got["u"] = got["v_str"].str.upper()
    got["z"] = got["v_str"].str.zfill(8)
    got["c"] = got["v_str"].str.contains("s00")
    want = pdf.copy()
    want["u"] = want["v_str"].str.upper()
    want["z"] = want["v_str"].str.zfill(8)
    want["c"] = want["v_str"].str.contains("s00")
    assert_frames_match(got, want)


def test_reductions(ldf, pdf):
    assert ldf["v_int"].sum() == pdf["v_int"].sum()
    assert abs(ldf["v_float"].mean() - pdf["v_float"].mean()) < 1e-9
    assert abs(ldf["v_float"].std() - pdf["v_float"].std()) < 1e-9
    assert ldf["v_int"].min() == pdf["v_int"].min()
    assert ldf["v_int"].nunique() == pdf["v_int"].nunique()


def test_concat_union(ldf, pdf):
    a = ldf[ldf["v_int"] > 50]
    b = ldf[ldf["v_int"] < -50]
    got = lps.concat([a, b])
    want = pd.concat([pdf[pdf["v_int"] > 50], pdf[pdf["v_int"] < -50]])
    assert_frames_match(got, want)


def test_equals(ldf):
    assert ldf.equals(ldf.copy())
    assert not ldf.equals(ldf[ldf["v_int"] > 0])


def test_cumsum_grouped(spark):
    p = pd.DataFrame({"g": [0, 0, 1, 1, 0], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    l = lps.from_pandas(p, spark=spark)
    got = l.groupby("g").cumsum().to_pandas()
    want = p.copy()
    want["v"] = p.groupby("g")["v"].cumsum()
    # group-cumsum keeps row identity; compare sorted by value
    assert sorted(got["v"]) == sorted(want["v"])


def test_rename_drop_prefix(ldf, pdf):
    got = ldf.rename(columns={"v_int": "vi"}).drop(columns=["v_str"]).add_prefix("p_")
    want = pdf.rename(columns={"v_int": "vi"}).drop(columns=["v_str"]).add_prefix("p_")
    assert sorted(got.columns) == sorted(want.columns)
