"""Targeted parity tests for the remaining reference test-corpus shapes
(reference tests/pandas/: df_set_axis, sr_groupby, df_query_with_null,
df_create_empty, df_binary_unaligned_column, df_fill_datetime,
tests/io/read_csv_index)."""

import datetime

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


def test_set_axis(spark):
    p = pd.DataFrame({"a": [1, 2], "b": [3.0, 4.0]})
    l = lps.from_pandas(p, spark=spark)
    got = l.set_axis(["x", "y"])
    want = p.set_axis(["x", "y"], axis=1)
    assert got.columns == list(want.columns)
    assert sorted(got.to_pandas()["x"]) == sorted(want["x"])


def test_series_groupby(spark):
    p = pd.DataFrame({"k": [0, 1, 0, 1, 0], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    l = lps.from_pandas(p, spark=spark)
    got = l["v"].groupby("k").sum().reset_index().to_pandas().sort_values("k")
    want = p["v"].groupby(p["k"]).sum().reset_index().sort_values("k")
    assert list(got["v"]) == list(want["v"])
    # grouping by an aligned Series expression
    got2 = (
        l["v"].groupby(l["k"] * 10).sum().reset_index().to_pandas().sort_values("k")
    )
    want2 = p["v"].groupby(p["k"] * 10).sum().reset_index().sort_values("k")
    assert list(got2["v"]) == list(want2["v"])


def test_query_with_null(spark):
    """pandas query excludes rows where the comparison involves NaN — Spark's
    SQL NULL filtering matches (reference df_query_with_null)."""
    p = pd.DataFrame({"a": [1.0, None, 3.0, None], "b": [10, 20, 30, 40]})
    l = lps.from_pandas(p, spark=spark)
    got = l.query("a > 1").to_pandas()
    want = p.query("a > 1")
    assert sorted(got["b"]) == sorted(want["b"])


def test_empty_frame_ops(spark):
    p = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="float64")})
    l = lps.from_pandas(p, spark=spark)
    assert len(l) == 0
    assert len(l[l["a"] > 0]) == 0
    assert len(l.head(5)) == 0
    g = l.groupby("a").agg({"b": "sum"}).reset_index()
    assert len(g) == 0
    assert sorted(g.columns) == ["a", "b"]


def test_filter_to_empty_then_ops(spark):
    p = pd.DataFrame({"a": [1, 2, 3]})
    l = lps.from_pandas(p, spark=spark)
    empty = l[l["a"] > 100]
    assert len(empty) == 0
    assert len(empty.sort_values("a").head(3)) == 0
    # round-9: empty-after-skipna identity — sum of an empty series is 0
    # like pandas (was NULL, the old documented divergence, now closed)
    assert empty["a"].sum() == 0


def test_binary_unaligned_raises(spark):
    a = lps.from_pandas(pd.DataFrame({"x": [1, 2]}), spark=spark)
    b = lps.from_pandas(pd.DataFrame({"x": [3, 4]}), spark=spark)
    with pytest.raises(ValueError, match="aligned"):
        _ = a["x"] + b["x"]  # reference raises on unaligned frames too


def test_fill_datetime_scalar(spark):
    p = pd.DataFrame({"a": [1, 2]})
    l = lps.from_pandas(p, spark=spark)
    stamp = datetime.datetime(2024, 6, 1, 12, 0, 0)
    l["ts"] = stamp
    got = l.to_pandas()
    assert list(got["ts"]) == [stamp, stamp]
    assert dict(l._sdf.dtypes)["ts"] == "timestamp"


def test_read_csv_index_col(tmp_path, spark):
    f = tmp_path / "idx.csv"
    f.write_text("id,v\n10,a\n20,b\n30,c\n")
    got = lps.read_csv(str(f), index_col="id", spark=spark)
    want = pd.read_csv(str(f), index_col="id")
    assert got.index_names == ("id",)
    gp = got.to_pandas()
    assert list(gp.index.name and [gp.index.name])[0] == "id"
    assert sorted(gp["v"]) == sorted(want["v"])
    # label-based loc works against the csv-derived index
    assert got.loc[20:30].to_pandas()["v"].tolist() == ["b", "c"]


def test_column_swap_multi_assign(spark):
    """reference df_swap: df[["col2","col1"]] = df[["col1","col2"]]."""
    p = pd.DataFrame({"col1": [1, 2, 3], "col2": [4, 5, 6]})
    l = lps.from_pandas(p, spark=spark)
    l[["col2", "col1"]] = l[["col1", "col2"]]
    got = l.to_pandas()
    assert l.columns == ["col1", "col2"]
    assert list(got["col1"]) == [4, 5, 6]
    assert list(got["col2"]) == [1, 2, 3]


def test_attribute_column_access(spark):
    p = pd.DataFrame({"col1": [1, 2, 3]})
    l = lps.from_pandas(p, spark=spark)
    assert l.col1.sum() == 6
    with pytest.raises(AttributeError):
        _ = l.not_a_column


def test_fill_numpy_typed_scalars(spark):
    """reference df_fill: broadcast-fill with typed numpy scalars."""
    p = pd.DataFrame({"c0": [1, 2, 3]})
    l = lps.from_pandas(p, spark=spark)
    l["c1"] = np.int32(7)
    l["c2"] = np.float32(2.5)
    l["c3"] = np.int64(9)
    got = l.to_pandas()
    assert list(got["c1"]) == [7, 7, 7]
    assert list(got["c2"]) == [2.5, 2.5, 2.5]
    assert list(got["c3"]) == [9, 9, 9]


def test_dataframe_ctor_pandas_and_dict(spark):
    """reference df_create: lp.DataFrame(pandas_df) drop-in constructor."""
    p = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    l = lps.DataFrame(p, spark=spark)
    assert sorted(l.to_pandas()["a"]) == [1, 2, 3]
    l2 = lps.DataFrame({"c": [1.5, 2.5]}, spark=spark)
    assert sorted(l2.to_pandas()["c"]) == [1.5, 2.5]


def test_series_ctor_list(spark):
    """reference sr_create: lp.Series([...])."""
    s = lps.Series([3, 1, 2], name="v")
    assert s.sum() == 6
    assert s.name == "v"
    ps = pd.Series([1.0, 2.0], name="w")
    s2 = lps.Series(ps)
    assert s2.name == "w"
    assert abs(s2.mean() - 1.5) < 1e-12


def test_groupby_named_aggregation(spark):
    p = pd.DataFrame({"k": [0, 0, 1], "v": [1.0, 2.0, 3.0]})
    l = lps.from_pandas(p, spark=spark)
    got = (
        l.groupby("k")
        .agg(total=("v", "sum"), biggest=("v", "max"), n=("v", "size"))
        .reset_index()
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        p.groupby("k")
        .agg(total=("v", "sum"), biggest=("v", "max"), n=("v", "size"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_merge_null_keys_match_pandas(spark):
    """pandas matches NaN join keys to each other (unlike SQL) — the facade
    uses null-safe equality (reference df_merge_with_null semantics)."""
    a = pd.DataFrame({"k": [1.0, None, 3.0], "x": [10, 20, 30]})
    b = pd.DataFrame({"k": [1.0, None], "y": [100, 200]})
    got = (
        lps.from_pandas(a, spark=spark)
        .merge(lps.from_pandas(b, spark=spark), on="k", how="inner")
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    want = a.merge(b, on="k", how="inner").sort_values("x").reset_index(drop=True)
    assert len(got) == len(want) == 2
    assert list(got["y"]) == list(want["y"])


def test_error_paths(spark):
    from legate_pandas_spark.frontend.query import QueryTranslationError

    a = lps.from_pandas(pd.DataFrame({"x": [1]}), spark=spark)
    b = lps.from_pandas(pd.DataFrame({"y": [2]}), spark=spark)
    with pytest.raises(ValueError, match="no common columns"):
        a.merge(b)
    with pytest.raises(ValueError, match="invalid how"):
        a.merge(b, left_on="x", right_on="y", how="sideways")
    with pytest.raises(QueryTranslationError):
        a.query("x.method()")  # unsupported call syntax
    with pytest.raises(ValueError, match="left_on and right_on"):
        a.merge(b, left_on="x")


def test_series_apply_pandas_udf(spark):
    p = pd.DataFrame({"x": [1.0, 4.0, 9.0]})
    l = lps.from_pandas(p, spark=spark)
    l["r"] = l["x"].apply(lambda s: s**0.5, dtype="double")
    got = l.to_pandas()
    assert sorted(got["r"]) == [1.0, 2.0, 3.0]


def test_read_json_lines(tmp_path, spark):
    f = tmp_path / "data.jsonl"
    f.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    got = lps.read_json(str(f), spark=spark).to_pandas()
    want = pd.read_json(str(f), lines=True)
    assert sorted(got["a"]) == sorted(want["a"])
    assert sorted(got["b"]) == sorted(want["b"])


def test_merge_indicator(spark):
    a = pd.DataFrame({"k": [1, 2, 3], "x": [10, 20, 30]})
    b = pd.DataFrame({"k": [2, 3, 4], "y": [200, 300, 400]})
    got = (
        lps.from_pandas(a, spark=spark)
        .merge(lps.from_pandas(b, spark=spark), on="k", how="outer", indicator=True)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = a.merge(b, on="k", how="outer", indicator=True).sort_values("k").reset_index(drop=True)
    assert list(got["_merge"]) == [str(v) for v in want["_merge"]]


def test_combine_first(spark):
    a = pd.DataFrame({"k": [1, 2, 3], "v": [None, 20.0, None], "w": ["a", None, "c"]})
    b = pd.DataFrame({"k": [2, 3, 4], "v": [99.0, 30.0, 40.0], "w": ["zz", "cc", "dd"]})
    la = lps.from_pandas(a, spark=spark).set_index("k")
    lb = lps.from_pandas(b, spark=spark).set_index("k")
    got = la.combine_first(lb).to_pandas().sort_index()
    want = a.set_index("k").combine_first(b.set_index("k")).sort_index()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)
