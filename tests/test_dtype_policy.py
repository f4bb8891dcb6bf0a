"""Dtype mapping and promotion policy (SURVEY §1.2): unsigned widening, int/int
division → float, datetime ns→µs truncation, null-compare-false, category-as-
string — the documented divergences, tested so they stay documented-and-true."""

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps
from legate_pandas_spark.frontend.dtypes import to_spark_type


def test_dtype_mapping_table():
    assert to_spark_type("int8") == "tinyint"
    assert to_spark_type("int64") == "long"
    assert to_spark_type("uint8") == "smallint"  # widen, no unsigned in Spark
    assert to_spark_type("uint16") == "int"
    assert to_spark_type("uint32") == "long"
    assert to_spark_type("uint64") == "long"  # documented overflow divergence
    assert to_spark_type("float32") == "float"
    assert to_spark_type("datetime64[ns]") == "timestamp"
    assert to_spark_type("category") == "string"
    assert to_spark_type("object") == "string"
    with pytest.raises(TypeError):
        to_spark_type("complex128")  # reference has no complex either


def test_uint_widening_roundtrip(spark):
    p = pd.DataFrame({"u8": np.array([0, 255], dtype="uint8")})
    l = lps.from_pandas(p.astype({"u8": "int64"}), spark=spark).astype({"u8": "uint8"})
    assert l.dtypes["u8"] == "smallint"
    got = l.to_pandas()
    assert list(got["u8"]) == [0, 255]  # no overflow at the type boundary


def test_int_division_promotes_to_float(spark):
    p = pd.DataFrame({"a": [7, 8], "b": [2, 4]})
    l = lps.from_pandas(p, spark=spark)
    l["d"] = l["a"] / l["b"]
    got = l.to_pandas()
    assert got["d"].dtype.kind == "f"
    assert list(got["d"]) == [3.5, 2.0]  # float division, not SQL int division


def test_floordiv_matches_pandas(spark):
    p = pd.DataFrame({"a": [7.0, -7.0], "b": [2.0, 2.0]})
    l = lps.from_pandas(p, spark=spark)
    l["fd"] = l["a"] // l["b"]
    got = l.to_pandas()
    want = p["a"] // p["b"]
    assert list(got["fd"]) == list(want)  # floor semantics incl. negatives


def test_null_compare_false(spark):
    p = pd.DataFrame({"a": [1.0, None, 3.0]})
    l = lps.from_pandas(p, spark=spark)
    l["gt"] = l["a"] > 2
    got = l.to_pandas()
    # pandas: NaN > 2 is False, result non-nullable (reference core/runtime.py:142)
    assert list(got["gt"]) == [False, False, True]
    assert got["gt"].isna().sum() == 0


def test_datetime_ns_truncates_to_us(spark, sf_dir):
    from legate_pandas_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # values preserved to µs: compare against pyarrow ground truth
    import pyarrow.parquet as pq

    truth = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "ts"]).to_pandas()
    got = ev.select("event_id", "ts").toPandas().sort_values("event_id")
    truth = truth.sort_values("event_id")
    diff = (truth["ts"].dt.floor("us").values - got["ts"].values).astype("timedelta64[ns]")
    assert (diff == np.timedelta64(0)).all()


def test_category_as_string_with_dictionary(spark):
    p = pd.DataFrame({"c": pd.Categorical(["b", "a", "b", "c"])})
    l = lps.from_pandas(p.astype({"c": "str"}), spark=spark)
    assert l.dtypes["c"] == "string"
    codes = l["c"].cat.codes
    l["codes"] = codes
    got = l.to_pandas()
    want = p["c"].cat.codes
    assert sorted(got["codes"]) == sorted(want)
