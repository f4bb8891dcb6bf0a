"""Round-8 breadth: DataFrame.filter/median/transform/from_dict/from_records,
Series case_when/is_monotonic/argmax/median/describe/tail, and the pandas
method-form aliases — each differential-tested against real pandas."""
import numpy as np
import pandas as pd
import pytest

from legate_pandas_spark.frontend.frame import DataFrame, from_pandas


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame(
        {
            "alpha_one": [1.0, 2.0, 3.0, 4.0],
            "alpha_two": [4.0, 3.0, None, 1.0],
            "beta": [10, 20, 30, 40],
            "s": ["x", "y", "z", "w"],
        }
    )


def test_frame_filter(spark, pdf):
    ldf = from_pandas(pdf, spark=spark)
    for kw in ({"items": ["beta", "alpha_one"]}, {"like": "alpha"}, {"regex": r"^a.*o$"}):
        got = ldf.filter(**kw)
        exp = pdf.filter(**kw)
        assert list(got.columns) == list(exp.columns), kw
    with pytest.raises(TypeError, match="mutually exclusive"):
        ldf.filter(items=["beta"], like="a")


def test_frame_median(spark, pdf):
    got = from_pandas(pdf, spark=spark).median()
    exp = pdf[["alpha_one", "alpha_two", "beta"]].median()
    for c in exp.index:
        assert abs(got[c] - exp[c]) < 1e-9, c


def test_frame_transform(spark, pdf):
    num = pdf[["alpha_one", "beta"]]
    got = from_pandas(num, spark=spark).transform("sqrt").to_pandas()
    exp = num.transform("sqrt")
    for c in exp.columns:
        assert np.allclose(got[c], exp[c])
    got2 = from_pandas(num, spark=spark).transform(["abs", "sqrt"]).to_pandas()
    assert "alpha_one_sqrt" in got2.columns and "beta_abs" in got2.columns
    with pytest.raises(NotImplementedError):
        from_pandas(num, spark=spark).transform("nope")


def test_frame_from_dict_from_records(spark):
    d = {"a": [1, 2], "b": [3.0, 4.0]}
    got = DataFrame.from_dict(d).to_pandas()
    exp = pd.DataFrame.from_dict(d)
    assert got["a"].tolist() == exp["a"].tolist()
    recs = [(1, "x"), (2, "y")]
    got2 = DataFrame.from_records(recs, columns=["i", "s"]).to_pandas()
    exp2 = pd.DataFrame.from_records(recs, columns=["i", "s"])
    assert got2["s"].tolist() == exp2["s"].tolist()


def test_frame_aliases(spark, pdf):
    ldf = from_pandas(pdf[["alpha_one", "alpha_two"]], spark=spark)
    p = pdf[["alpha_one", "alpha_two"]]
    assert (
        ldf.isnull().to_pandas()["alpha_two"].tolist()
        == p.isnull()["alpha_two"].tolist()
    )
    assert (
        ldf.notnull().to_pandas()["alpha_two"].tolist()
        == p.notnull()["alpha_two"].tolist()
    )
    assert sorted(ldf.pad().to_pandas()["alpha_two"].fillna(-1)) == sorted(
        p.ffill()["alpha_two"].fillna(-1)
    )
    got = ldf.multiply(2).to_pandas()
    assert got["alpha_one"].tolist() == (p["alpha_one"] * 2).tolist()
    assert isinstance(ldf.to_string(), str)
    assert "alpha_one" in ldf.to_html()  # to_markdown needs tabulate (absent here)
    assert ldf.product()["alpha_one"] == p["alpha_one"].prod()


def test_series_median_describe(spark, pdf):
    ldf = from_pandas(pdf, spark=spark)
    assert abs(ldf["alpha_two"].median() - pdf["alpha_two"].median()) < 1e-9
    got = ldf["alpha_one"].describe()
    exp = pdf["alpha_one"].describe()
    for k in ("count", "mean", "std", "min", "25%", "50%", "75%", "max"):
        assert abs(got[k] - exp[k]) < 1e-9, k


def test_series_case_when(spark, pdf):
    ldf = from_pandas(pdf, spark=spark)
    s = ldf["alpha_one"]
    got = (
        s.case_when([(s > 3, 100.0), (s > 1, 50.0)]).to_pandas().tolist()
    )
    ps = pdf["alpha_one"]
    exp = ps.case_when([(ps > 3, 100.0), (ps > 1, 50.0)]).tolist()
    assert got == exp


def test_series_is_monotonic(spark):
    inc = pd.DataFrame({"v": [1.0, 2.0, 2.0, 5.0]})
    dec = pd.DataFrame({"v": [5.0, 3.0, 3.0, 1.0]})
    mixed = pd.DataFrame({"v": [1.0, 3.0, 2.0]})
    withnull = pd.DataFrame({"v": [1.0, None, 3.0]})
    for df, attr, exp in [
        (inc, "is_monotonic_increasing", True),
        (inc, "is_monotonic_decreasing", False),
        (dec, "is_monotonic_decreasing", True),
        (mixed, "is_monotonic_increasing", False),
        (withnull, "is_monotonic_increasing", False),
    ]:
        got = getattr(from_pandas(df, spark=spark)["v"], attr)
        assert got == getattr(df["v"], attr) == exp, (df["v"].tolist(), attr)


def test_series_is_monotonic_multipartition(spark):
    """Boundary stitching: monotone within every partition but broken AT a
    partition boundary must return False."""
    n = 5000
    inc = pd.DataFrame({"v": np.arange(n, dtype="float64")})
    ldf = from_pandas(inc, spark=spark)
    assert ldf["v"].is_monotonic_increasing is True
    broken = inc.copy()
    broken.loc[n - 1, "v"] = -1.0  # breaks across the last boundary or within
    assert from_pandas(broken, spark=spark)["v"].is_monotonic_increasing is False


def test_series_argmax_argmin_tail(spark, pdf):
    ldf = from_pandas(pdf, spark=spark)
    assert ldf["alpha_two"].argmax() == pdf["alpha_two"].argmax()
    assert ldf["alpha_two"].argmin() == pdf["alpha_two"].argmin()
    assert ldf["beta"].argmax() == pdf["beta"].argmax()
    got = ldf["beta"].tail(2).to_pandas().tolist()
    assert got == pdf["beta"].tail(2).tolist()


def test_series_aliases_and_utils(spark, pdf):
    ldf = from_pandas(pdf, spark=spark)
    s = ldf["alpha_one"]
    assert s.multiply(3).to_pandas().tolist() == (pdf["alpha_one"] * 3).tolist()
    assert s.subtract(1).to_pandas().tolist() == (pdf["alpha_one"] - 1).tolist()
    assert s.divide(2).to_pandas().tolist() == (pdf["alpha_one"] / 2).tolist()
    assert s.transpose() is s and s.T is s
    assert s.copy().to_pandas().tolist() == pdf["alpha_one"].tolist()
    assert s.pipe(lambda x, k: x.sum() + k, 1) == pdf["alpha_one"].sum() + 1
    assert s.to_dict() == pdf["alpha_one"].to_dict()
    assert isinstance(s.to_string(), str)
    p = ldf["alpha_two"].pad().to_pandas().tolist()
    assert p == pdf["alpha_two"].ffill().tolist()
    b = ldf["alpha_two"].backfill().to_pandas().tolist()
    assert b == pdf["alpha_two"].bfill().tolist()


def test_series_frame_delegations(spark):
    pdf = pd.DataFrame({"k": [3, 1, 2], "v": [30.0, 10.0, 20.0]}).set_index("k")
    ldf = from_pandas(pdf.reset_index(), spark=spark).set_index("k")
    s = ldf["v"]
    got = s.sort_index().to_pandas().tolist()
    assert got == pdf["v"].sort_index().tolist()
    tr = s.truncate(before=1, after=2).to_pandas()
    exp = pdf["v"].sort_index().truncate(before=1, after=2)
    assert sorted(tr) == sorted(exp)
    # reset_index shapes
    r1 = s.reset_index(drop=True)
    assert r1.to_pandas().sort_values().tolist() == sorted(pdf["v"])
    r2 = s.reset_index()
    assert set(r2.columns) >= {"k", "v"}
    # positional take on a fresh frame
    pdf2 = pd.DataFrame({"v": [10.0, 20.0, 30.0, 40.0]})
    s2 = from_pandas(pdf2, spark=spark)["v"]
    assert sorted(s2.take([0, 2]).to_pandas()) == [10.0, 30.0]
