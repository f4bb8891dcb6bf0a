"""Parquet pandas-metadata index round-trip (reference core/io.py:56-68;
layout cases modeled on the reference's tests/io parquet fixtures): to_parquet
records the index layout, read_parquet restores it with no explicit index_col —
including files written by pandas/pyarrow directly."""

import os

import pandas as pd
import pytest

import legate_pandas_spark as lps


@pytest.fixture()
def tmp_pq(tmp_path):
    return str(tmp_path / "rt.parquet")


def test_roundtrip_default_rangeindex(spark, tmp_pq):
    pdf = pd.DataFrame({"a": range(10), "b": [f"s{i}" for i in range(10)]})
    lps.from_pandas(pdf, spark=spark).to_parquet(tmp_pq)
    back = lps.read_parquet(tmp_pq, spark=spark)
    assert back._index == ()  # default range index stays virtual
    got = back.to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, pdf, check_dtype=False)


def test_roundtrip_stored_index(spark, tmp_pq):
    pdf = pd.DataFrame({"k": [3, 1, 2], "v": [30.0, 10.0, 20.0]}).set_index("k")
    lps.from_pandas(pdf.reset_index(), spark=spark).set_index("k").to_parquet(tmp_pq)
    back = lps.read_parquet(tmp_pq, spark=spark)
    assert list(back._index) == ["k"]
    got = back.to_pandas().sort_index()
    pd.testing.assert_frame_equal(got, pdf.sort_index(), check_dtype=False)


def test_roundtrip_multiindex(spark, tmp_pq):
    pdf = pd.DataFrame(
        {"g": ["x", "x", "y"], "k": [1, 2, 1], "v": [1.0, 2.0, 3.0]}
    )
    lps.from_pandas(pdf, spark=spark).set_index(["g", "k"]).to_parquet(tmp_pq)
    back = lps.read_parquet(tmp_pq, spark=spark)
    assert list(back._index) == ["g", "k"]
    got = back.to_pandas().sort_index()
    want = pdf.set_index(["g", "k"]).sort_index()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_read_pandas_written_named_index(spark, tmp_path):
    """A file pandas wrote itself (single file, real pandas blob)."""
    p = str(tmp_path / "pandas_file.parquet")
    pdf = pd.DataFrame({"v": [5.0, 6.0, 7.0]}, index=pd.Index([9, 8, 7], name="key"))
    pdf.to_parquet(p)
    back = lps.read_parquet(p, spark=spark)
    assert list(back._index) == ["key"]
    got = back.to_pandas().sort_index()
    pd.testing.assert_frame_equal(got, pdf.sort_index(), check_dtype=False)


def test_read_pandas_written_unnamed_index(spark, tmp_path):
    """Unnamed index serializes as __index_level_0__ — restored under the
    visible name 'index' (our __*__ names are hidden plumbing)."""
    p = str(tmp_path / "unnamed.parquet")
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0]}, index=[10, 20, 30])
    pdf.to_parquet(p)
    back = lps.read_parquet(p, spark=spark)
    assert list(back._index) == ["index"]
    got = back.to_pandas().sort_index()
    assert got.index.tolist() == [10, 20, 30]
    assert got["v"].tolist() == [1.0, 2.0, 3.0]


def test_read_pandas_written_nondefault_range(spark, tmp_path):
    """RangeIndex(start=5, step=10) materializes via partition-offset
    positions (no global window)."""
    p = str(tmp_path / "range.parquet")
    pdf = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0]}, index=pd.RangeIndex(5, 45, 10))
    pdf.to_parquet(p)
    back = lps.read_parquet(p, spark=spark)
    assert list(back._index) == ["index"] or list(back._index)
    got = back.to_pandas().sort_index()
    assert got.index.tolist() == [5, 15, 25, 35]
    assert got["v"].tolist() == [1.0, 2.0, 3.0, 4.0]


def test_explicit_index_col_overrides_metadata(spark, tmp_pq):
    pdf = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    lps.from_pandas(pdf, spark=spark).set_index("k").to_parquet(tmp_pq)
    back = lps.read_parquet(tmp_pq, index_col="v", spark=spark)
    assert list(back._index) == ["v"]


def test_roundtrip_index_false_writes_no_sidecar(spark, tmp_pq):
    pdf = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    lps.from_pandas(pdf, spark=spark).set_index("k").to_parquet(tmp_pq, index=False)
    assert not os.path.exists(os.path.join(tmp_pq, "_pandas_index_metadata"))
    back = lps.read_parquet(tmp_pq, spark=spark)
    assert back._index == ()
