"""Round-5 facade parity batch: Series replace/explode/combine_first/
skew/kurt/product/to_list, str match/fullmatch/ljust/rjust/partition/rsplit,
groupby cumprod/ngroup/value_counts/pipe — all differential vs real pandas."""

import pandas as pd
import pytest

import legate_pandas_spark as lps


@pytest.fixture()
def sdf_str(spark):
    pdf = pd.DataFrame({"s": ["a-b-c-d", "x", "", "one two three", "a-b"]})
    return pdf, lps.from_pandas(pdf, spark=spark)


def test_str_match_fullmatch(sdf_str):
    pdf, ldf = sdf_str
    assert ldf["s"].str.match(r"[ax]").to_pandas().tolist() == pdf["s"].str.match(r"[ax]").tolist()
    assert (
        ldf["s"].str.fullmatch(r"[ax]").to_pandas().tolist()
        == pdf["s"].str.fullmatch(r"[ax]").tolist()
    )


def test_str_ljust_rjust(sdf_str):
    pdf, ldf = sdf_str
    assert ldf["s"].str.ljust(5, "*").to_pandas().tolist() == pdf["s"].str.ljust(5, "*").tolist()
    assert ldf["s"].str.rjust(5, "*").to_pandas().tolist() == pdf["s"].str.rjust(5, "*").tolist()


def test_str_partition(sdf_str):
    pdf, ldf = sdf_str
    got = ldf["s"].str.partition("-").to_pandas().values.tolist()
    want = pdf["s"].str.partition("-").values.tolist()
    assert got == want


@pytest.mark.parametrize("n", [-1, 1, 2])
def test_str_rsplit(sdf_str, n):
    pdf, ldf = sdf_str
    got = [list(x) for x in ldf["s"].str.rsplit("-", n=n).to_pandas().tolist()]
    assert got == pdf["s"].str.rsplit("-", n=n).tolist()


def test_series_replace_forms(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0, 10.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    assert (
        ldf["a"].replace({1.0: 100.0, 3.0: 300.0}).to_pandas().tolist()
        == pdf["a"].replace({1.0: 100.0, 3.0: 300.0}).tolist()
    )
    assert (
        ldf["a"].replace([1.0, 2.0], 0.0).to_pandas().tolist()
        == pdf["a"].replace([1.0, 2.0], 0.0).tolist()
    )
    assert (
        ldf["a"].replace(10.0, -1.0).to_pandas().tolist()
        == pdf["a"].replace(10.0, -1.0).tolist()
    )


def test_series_combine_first_product_tolist(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [None, 5.0, None]})
    ldf = lps.from_pandas(pdf, spark=spark)
    assert (
        ldf["b"].combine_first(ldf["a"]).to_pandas().tolist()
        == pdf["b"].combine_first(pdf["a"]).tolist()
    )
    assert ldf["a"].product() == pdf["a"].product()
    assert ldf["a"].to_list() == pdf["a"].to_list()


def test_series_skew_kurt_match_pandas(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0, 10.0, -3.5, 0.25]})
    ldf = lps.from_pandas(pdf, spark=spark)
    assert abs(ldf["a"].skew() - pdf["a"].skew()) < 1e-12
    assert abs(ldf["a"].kurt() - pdf["a"].kurt()) < 1e-12


def test_series_skew_kurt_small_n_nan(spark):
    import math

    pdf = pd.DataFrame({"a": [1.0, 2.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    assert math.isnan(ldf["a"].skew())
    assert math.isnan(ldf["a"].kurt())


def test_series_skew_kurt_constant_is_zero(spark):
    """pandas returns 0.0 (not NaN) for a zero-variance series."""
    pdf = pd.DataFrame({"a": [5.0] * 6})
    ldf = lps.from_pandas(pdf, spark=spark)
    assert ldf["a"].skew() == pdf["a"].skew() == 0.0
    assert ldf["a"].kurt() == pdf["a"].kurt() == 0.0


def test_series_explode_after_findall(sdf_str):
    pdf, ldf = sdf_str
    got = ldf["s"].str.findall(r"\w+").explode().to_pandas().fillna("__na__").tolist()
    want = pdf["s"].str.findall(r"\w+").explode().fillna("__na__").tolist()
    assert got == want


def test_groupby_cumprod(spark):
    pdf = pd.DataFrame({"k": [0, 0, 1, 1, 1], "v": [2.0, 3.0, 1.5, 2.0, -1.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").cumprod().to_pandas()["v"].tolist()
    want = pdf.groupby("k").cumprod()["v"].tolist()
    assert got == want


def test_groupby_ngroup_sorted_order(spark):
    # round 6: ngroup is positionally aligned with the source frame (ADVICE
    # fix), so the group id Series zips directly against the key column
    pdf = pd.DataFrame({"k": ["b", "a", "b", "c", "a"], "v": range(5)})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").ngroup().to_pandas()
    mapping = dict(zip(pdf["k"], got))
    # sorted key order: a→0, b→1, c→2 (pandas groupby(sort=True).ngroup())
    assert mapping == {"a": 0, "b": 1, "c": 2}
    assert got.tolist() == pdf.groupby("k", sort=True).ngroup().tolist()


def test_groupby_value_counts(spark):
    pdf = pd.DataFrame(
        {"k": ["x", "x", "x", "y", "y"], "v": ["p", "p", "q", "p", "r"]}
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").value_counts().to_pandas().reset_index()
    want = pdf.groupby("k").value_counts().reset_index()
    got = got.sort_values(["k", "v"]).reset_index(drop=True)
    want = want.sort_values(["k", "v"]).reset_index(drop=True)
    assert got["count"].tolist() == want["count"].tolist()
    got_n = ldf.groupby("k").value_counts(normalize=True).to_pandas().reset_index()
    want_n = pdf.groupby("k").value_counts(normalize=True).reset_index()
    got_n = got_n.sort_values(["k", "v"]).reset_index(drop=True)
    want_n = want_n.sort_values(["k", "v"]).reset_index(drop=True)
    assert got_n["proportion"].tolist() == pytest.approx(want_n["proportion"].tolist())


def test_groupby_pipe(spark):
    pdf = pd.DataFrame({"k": [0, 0, 1], "v": [1.0, 2.0, 3.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("k").pipe(lambda g: g.agg({"v": "sum"})).to_pandas()
    want = pdf.groupby("k").pipe(lambda g: g.agg({"v": "sum"}))
    assert sorted(got["v"].tolist()) == sorted(want["v"].tolist())
