"""Round-7 breadth: multi-column explode, str.get_dummies, convert_dtypes —
each differential-tested against real pandas."""
import numpy as np
import pandas as pd
import pytest

from legate_pandas_spark.frontend.frame import from_pandas


def test_explode_multi_column(spark):
    pdf = pd.DataFrame(
        {
            "a": [[1, 2], [3], None],
            "b": [["x", "y"], ["z"], None],
            "k": [10, 20, 30],
        }
    )
    got = from_pandas(pdf, spark=spark).explode(["a", "b"]).to_pandas()
    exp = pdf.explode(["a", "b"])
    assert got["k"].tolist() == exp["k"].tolist()
    assert (
        pd.to_numeric(got["a"]).fillna(-1).tolist()
        == pd.to_numeric(exp["a"]).fillna(-1).tolist()
    )
    assert got["b"].fillna("~").tolist() == exp["b"].fillna("~").tolist()


def test_explode_multi_column_mismatch_raises(spark):
    pdf = pd.DataFrame({"a": [[1, 2]], "b": [["x"]]})
    ldf = from_pandas(pdf, spark=spark)
    with pytest.raises(ValueError, match="matching element counts"):
        ldf.explode(["a", "b"])
    with pytest.raises(ValueError):
        pdf.explode(["a", "b"])


def test_explode_single_still_works(spark):
    pdf = pd.DataFrame({"a": [[1, 2], [], None], "k": [1, 2, 3]})
    got = from_pandas(pdf, spark=spark).explode("a").to_pandas()
    exp = pdf.explode("a")
    assert got["k"].tolist() == exp["k"].tolist()


def test_str_get_dummies(spark):
    pdf = pd.DataFrame({"s": ["a|b", "b", None, "c|a", ""]})
    got = from_pandas(pdf, spark=spark)["s"].str.get_dummies().to_pandas()
    exp = pdf["s"].str.get_dummies()
    assert list(got.columns) == list(exp.columns)
    for c in exp.columns:
        assert got[c].tolist() == exp[c].tolist()


def test_str_get_dummies_custom_sep(spark):
    pdf = pd.DataFrame({"s": ["a,b", "b,c", "a"]})
    got = from_pandas(pdf, spark=spark)["s"].str.get_dummies(sep=",").to_pandas()
    exp = pdf["s"].str.get_dummies(sep=",")
    assert list(got.columns) == list(exp.columns)
    for c in exp.columns:
        assert got[c].tolist() == exp[c].tolist()


def test_convert_dtypes_integral_floats(spark):
    pdf = pd.DataFrame(
        {
            "f_int": [1.0, 2.0, None],
            "f_real": [1.5, 2.0, 3.0],
            "s": ["x", "y", "z"],
            "i": [1, 2, 3],
        }
    )
    ldf = from_pandas(pdf, spark=spark).convert_dtypes()
    dt = ldf.dtypes
    assert dt["f_int"] == "bigint"  # pandas → Int64 (nullable int)
    assert dt["f_real"] == "double"
    assert dt["i"] == "bigint"
    exp = pdf.convert_dtypes()
    assert str(exp["f_int"].dtype) == "Int64"
    got = ldf.to_pandas()
    assert got["f_int"].dropna().tolist() == exp["f_int"].dropna().tolist()
    assert got["f_real"].tolist() == exp["f_real"].tolist()


def test_sample_n_exact(spark):
    pdf = pd.DataFrame({"v": range(200)})
    ldf = from_pandas(pdf, spark=spark)
    got = ldf.sample(n=17, random_state=42).to_pandas()
    assert len(got) == 17
    assert set(got["v"]).issubset(set(range(200)))
    # deterministic under a seed
    got2 = ldf.sample(n=17, random_state=42).to_pandas()
    assert sorted(got["v"]) == sorted(got2["v"])
    # plan uses top-n, not a global sort
    plan = ldf.sample(n=17, random_state=1)._sdf._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_corrwith_series_matches_pandas(spark):
    pdf = pd.DataFrame(
        {
            "a": [1.0, 2.0, 3.0, 4.0],
            "b": [2.0, 1.0, 4.0, 3.0],
            "y": [1.0, 3.0, 2.0, 5.0],
            "s": ["x", "y", "z", "w"],
        }
    )
    ldf = from_pandas(pdf, spark=spark)
    got = ldf.corrwith(ldf["y"])
    exp = pdf[["a", "b", "y"]].corrwith(pdf["y"])
    for c in ("a", "b", "y"):
        assert abs(got[c] - exp[c]) < 1e-9
    with pytest.raises(ValueError, match="same frame"):
        other = from_pandas(pdf, spark=spark)
        ldf.corrwith(other["y"])


def test_at_time_between_time(spark):
    idx = pd.date_range("2024-01-01", periods=30, freq="37min")
    pdf = pd.DataFrame({"ts": idx, "v": range(30)})
    ldf = from_pandas(pdf, spark=spark).set_index("ts")
    ppdf = pdf.set_index("ts")
    got = ldf.at_time("09:52").to_pandas()
    exp = ppdf.at_time("09:52")
    assert sorted(got["v"]) == sorted(exp["v"])
    gbt = ldf.between_time("06:00", "12:00").to_pandas()
    ebt = ppdf.between_time("06:00", "12:00")
    assert sorted(gbt["v"]) == sorted(ebt["v"])
    gbt2 = ldf.between_time("06:00", "12:00", inclusive="left").to_pandas()
    ebt2 = ppdf.between_time("06:00", "12:00", inclusive="left")
    assert sorted(gbt2["v"]) == sorted(ebt2["v"])


def test_to_records(spark):
    pdf = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    got = from_pandas(pdf, spark=spark).to_records(index=False)
    exp = pdf.to_records(index=False)
    assert got.tolist() == exp.tolist()
