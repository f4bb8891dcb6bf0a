"""Round-7 regression pins for the round-6 ADVICE findings.

1. Series.repeat(0) returns an empty Series (sequence(0,-1) previously
   emitted every element twice with colliding order keys).
2. DataFrame.dot raises ValueError('matrices are not aligned') when the
   frame has columns absent from the right matrix's index (pandas parity;
   silent drop was a wrong-answer path).
3. rename_axis raises when the target name collides with an existing data
   column (the stored index is a physical column; a silent duplicate name
   breaks downstream references).
"""
import pandas as pd
import pytest

from legate_pandas_spark.frontend.frame import from_pandas


def test_series_repeat_zero_is_empty(spark):
    pdf = pd.DataFrame({"v": [1, 2, 3]})
    got = from_pandas(pdf, spark=spark)["v"].repeat(0).to_pandas()
    exp = pdf["v"].repeat(0)
    assert got.tolist() == exp.tolist() == []


@pytest.mark.parametrize("n", [1, 2, 3])
def test_series_repeat_positive_still_correct(spark, n):
    pdf = pd.DataFrame({"v": [10, 20, 30]})
    got = from_pandas(pdf, spark=spark)["v"].repeat(n).to_pandas()
    exp = pdf["v"].repeat(n)
    assert got.tolist() == exp.tolist()


def test_dot_unaligned_raises(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    ldf = from_pandas(pdf, spark=spark)
    # right matrix missing column 'b' of self → pandas raises
    right = pd.DataFrame({"x": [1.0]}, index=["a"])
    with pytest.raises(ValueError, match="not aligned"):
        ldf.dot(right)
    with pytest.raises(ValueError):
        pdf.dot(right)


def test_dot_aligned_matches_pandas(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    right = pd.DataFrame({"x": [2.0, 0.5], "y": [1.0, -1.0]}, index=["a", "b"])
    got = from_pandas(pdf, spark=spark).dot(right).to_pandas()
    exp = pdf.dot(right)
    assert got["x"].tolist() == exp["x"].tolist()
    assert got["y"].tolist() == exp["y"].tolist()


def test_rename_axis_collision_raises(spark):
    pdf = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    ldf = from_pandas(pdf, spark=spark).set_index("k")
    with pytest.raises(ValueError, match="already exists"):
        ldf.rename_axis("v")


def test_rename_axis_still_renames(spark):
    pdf = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    ldf = from_pandas(pdf, spark=spark).set_index("k").rename_axis("key")
    got = ldf.to_pandas()
    assert got.index.name == "key"
    assert got["v"].tolist() == [1, 2]
