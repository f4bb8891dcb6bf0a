"""Round-8 ADVICE fixes, each differential-tested:

1. convert_dtypes must keep NaN/Inf/out-of-bigint-range float columns as
   float (Spark's NaN != round(NaN) is FALSE, Inf is 'integral' — a blind
   bigint cast corrupts them to 0 / Long.MAX).
2. pq_encode_stream must emit the CENTROID ID of the argmin, not its
   position in the sorted-cid list — diverges when the trained codebook has
   empty clusters (non-contiguous cids).
3. Multi-column explode follows pandas 2.x mylen exactly: null scalars and
   empty lists count as length 1 (null-vs-[x] explodes, pairing the value;
   null-vs-[x,y] raises).
4. sample(n) raises when n exceeds the population (replace=False), like
   pandas.
5. at_time/between_time accept non-zero-padded inputs like '9:30'.
"""
import math

import pandas as pd
import pytest

from legate_pandas_spark.frontend.frame import from_pandas


def test_convert_dtypes_nan_inf_huge(spark):
    """True Spark-side NaN/Inf/huge doubles (from_pandas nulls NaN via
    Arrow, so build the frame straight from Spark rows — the shape NaN takes
    when it arises from 0/0 arithmetic or parquet)."""
    from legate_pandas_spark.frontend.frame import DataFrame

    sdf = spark.createDataFrame(
        [
            (1.0, 1.0, 1.0, 1.0, 1.0),
            (float("nan"), float("inf"), float("-inf"), 1e300, 2.0),
            (2.0, 2.0, 2.0, 2.0, 3.0),
        ],
        "has_nan double, has_inf double, has_ninf double, huge double, clean double",
    )
    ldf = DataFrame(sdf).convert_dtypes()
    dt = ldf.dtypes
    # Inf / out-of-range stay float (pandas keeps them Float64)
    assert dt["has_inf"] == "double"
    assert dt["has_ninf"] == "double"
    assert dt["huge"] == "double"
    # NaN is pandas-missing: column becomes nullable int with a null,
    # exactly like pandas convert_dtypes -> Int64 with NA — never 0
    assert dt["has_nan"] == "bigint"
    assert dt["clean"] == "bigint"
    got = ldf.to_pandas().sort_values("clean").reset_index(drop=True)
    assert math.isinf(got["has_inf"][1]) and got["has_inf"][1] > 0
    assert math.isinf(got["has_ninf"][1]) and got["has_ninf"][1] < 0
    assert got["huge"][1] == 1e300
    assert pd.isna(got["has_nan"][1])
    assert got["has_nan"].dropna().tolist() == [1.0, 2.0]
    # pandas differential on the same values
    exp = pd.DataFrame(
        {
            "has_nan": [1.0, float("nan"), 2.0],
            "has_inf": [1.0, float("inf"), 2.0],
            "huge": [1.0, 1e300, 2.0],
        }
    ).convert_dtypes()
    assert str(exp["has_nan"].dtype) == "Int64"
    assert str(exp["has_inf"].dtype).startswith("Float")
    assert str(exp["huge"].dtype).startswith("Float")


def test_pq_encode_noncontiguous_cids(spark):
    """Codebook with empty clusters (cids 0,3,7): the emitted code must be
    the cid itself, not the argmin's index in the sorted cid list."""
    from legate_pandas_spark.streaming.documents import pq_encode_stream

    codebook = [
        (0, 0, 0, 0.0),
        (0, 0, 1, 0.0),
        (0, 3, 0, 10.0),
        (0, 3, 1, 10.0),
        (0, 7, 0, 20.0),
        (0, 7, 1, 20.0),
    ]
    df = spark.createDataFrame(
        [
            (1, [0.1, 0.1], "a"),
            (2, [9.9, 9.8], "b"),
            (3, [19.5, 20.2], "c"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    out = {r["vec_id"]: r["code_0"] for r in pq_encode_stream(df, codebook).collect()}
    assert out == {1: 0, 2: 3, 3: 7}


def test_explode_null_vs_one_element_pairs_value(spark):
    # pandas 2.2.2: null counts as length 1, so this explodes (a=None, b=9)
    pdf = pd.DataFrame({"a": [None, [1, 2]], "b": [[9], [3, 4]], "k": [1, 2]})
    got = (
        from_pandas(pdf, spark=spark)
        .explode(["a", "b"])
        .to_pandas()
        .sort_values(["k", "b"])
    )
    exp = pdf.explode(["a", "b"]).sort_values(["k", "b"])
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["b"].tolist() == [9, 3, 4]  # the 9 must NOT be nulled out
    assert pd.isna(got["a"].iloc[0])
    assert pd.to_numeric(got["a"]).fillna(-1).tolist() == pd.to_numeric(
        exp["a"]
    ).fillna(-1).tolist()


def test_explode_null_vs_two_elements_raises(spark):
    pdf = pd.DataFrame({"a": [None], "b": [[9, 10]]})
    with pytest.raises(ValueError, match="matching element counts"):
        from_pandas(pdf, spark=spark).explode(["a", "b"])
    with pytest.raises(ValueError):
        pdf.explode(["a", "b"])


def test_explode_empty_vs_one_element_ok(spark):
    # pandas: [] counts as length 1 too — no raise, pads with NaN
    pdf = pd.DataFrame({"a": [[]], "b": [[9]]})
    got = from_pandas(pdf, spark=spark).explode(["a", "b"]).to_pandas()
    exp = pdf.explode(["a", "b"])
    assert len(got) == len(exp) == 1
    assert got["b"].tolist() == [9]
    assert pd.isna(got["a"].iloc[0])


def test_sample_n_larger_than_population_raises(spark):
    pdf = pd.DataFrame({"v": range(10)})
    ldf = from_pandas(pdf, spark=spark)
    with pytest.raises(ValueError, match="larger sample than population"):
        ldf.sample(n=11)
    with pytest.raises(ValueError):
        pdf.sample(n=11)
    # n == population is fine (pandas allows it)
    assert len(ldf.sample(n=10).to_pandas()) == 10


def test_at_time_between_time_unpadded_input(spark):
    idx = pd.date_range("2024-01-01 09:00", periods=40, freq="15min")
    pdf = pd.DataFrame({"ts": idx, "v": range(40)})
    ldf = from_pandas(pdf, spark=spark).set_index("ts")
    ppdf = pdf.set_index("ts")
    got = ldf.at_time("9:30").to_pandas()
    exp = ppdf.at_time("9:30")
    assert len(exp) > 0  # the fixture must actually hit 09:30 rows
    assert sorted(got["v"]) == sorted(exp["v"])
    gbt = ldf.between_time("9:30", "10:45").to_pandas()
    ebt = ppdf.between_time("9:30", "10:45")
    assert sorted(gbt["v"]) == sorted(ebt["v"])
    with pytest.raises(ValueError, match="Cannot convert"):
        ldf.at_time("not-a-time")
