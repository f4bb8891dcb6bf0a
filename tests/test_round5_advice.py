"""Round-5 ADVICE regression pins: Series.map coercion guard, typed
shift(fill_value), Unicode str predicates, sample divergences, extractall
group names + non-participating groups."""

import pandas as pd
import pytest

import legate_pandas_spark as lps


# ---------------------------------------------------------------- Series.map
def test_map_mixed_return_type_raises_not_coerces(spark):
    """A mapper whose return type is value-dependent (numeric for the probed
    head, string later) must RAISE, not silently NaN the string results."""
    pdf = pd.DataFrame({"a": list(range(200))})
    ldf = lps.from_pandas(pdf, spark=spark)

    def mapper(v):
        return v * 2 if v < 150 else f"big-{v}"

    with pytest.raises(Exception, match="non-numeric"):
        ldf["a"].map(mapper).to_pandas()


def test_map_numeric_with_none_still_works(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["a"].map(lambda v: None if v == 2.0 else v * 10).to_pandas()
    want = pdf["a"].map(lambda v: None if v == 2.0 else v * 10)
    assert got.fillna(-1).tolist() == want.fillna(-1).tolist()


# ------------------------------------------------------- shift(fill_value)
def test_shift_fill_string_column_not_promoted(spark):
    """Numeric fill on a frame with a string column: the string column keeps
    its dtype and its vacated slot stays null (not '0.0')."""
    pdf = pd.DataFrame({"n": [1.0, 2.0, 3.0], "s": ["x", "y", "z"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.shift(1, fill_value=0.0).to_pandas()
    assert got["n"].tolist() == [0.0, 1.0, 2.0]
    assert got["s"].isna().tolist() == [True, False, False]
    assert got["s"].dropna().tolist() == ["x", "y"]


def test_shift_float_fill_widens_int_column(spark):
    pdf = pd.DataFrame({"i": [10, 20, 30]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.shift(1, fill_value=0.5).to_pandas()
    want = pdf.shift(1, fill_value=0.5)
    assert got["i"].tolist() == want["i"].tolist() == [0.5, 10.0, 20.0]


def test_series_shift_incompatible_fill_raises(spark):
    pdf = pd.DataFrame({"s": ["x", "y", "z"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    with pytest.raises(TypeError, match="incompatible"):
        ldf["s"].shift(1, fill_value=7)


def test_series_shift_compatible_fill(spark):
    pdf = pd.DataFrame({"s": ["x", "y", "z"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf["s"].shift(1, fill_value="FILL").to_pandas()
    want = pdf["s"].shift(1, fill_value="FILL")
    assert got.tolist() == want.tolist()


def test_shift_timestamp_fill(spark):
    pdf = pd.DataFrame(
        {"t": pd.to_datetime(["2020-01-01", "2020-01-02", "2020-01-03"])}
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    fill = pd.Timestamp("1970-01-01")
    got = ldf["t"].shift(1, fill_value=fill).to_pandas()
    want = pdf["t"].shift(1, fill_value=fill)
    assert got.tolist() == want.tolist()


# -------------------------------------------------- Unicode str predicates
def test_str_predicates_unicode(spark):
    vals = ["abc", "été", "漢字", "١٢٣", "123", "ABC", "Éa", "ÉTÉ", "abc1", ""]
    pdf = pd.DataFrame({"s": vals})
    ldf = lps.from_pandas(pdf, spark=spark)
    for meth in ("isdigit", "isalpha", "isupper", "islower"):
        got = getattr(ldf["s"].str, meth)().to_pandas().tolist()
        want = [getattr(v, meth)() for v in vals]
        assert got == want, (meth, list(zip(vals, got, want)))


# ------------------------------------------------------ sample divergences
def test_groupby_sample_small_group_documented_divergence(spark):
    """Groups smaller than n return all their rows (documented; pandas
    raises). Pin the documented behavior so a silent change is caught."""
    pdf = pd.DataFrame({"k": ["a"] * 5 + ["b"], "v": range(6)})
    ldf = lps.from_pandas(pdf, spark=spark)
    out = ldf.groupby("k").sample(n=3, random_state=7).to_pandas()
    counts = out.groupby("k").size()
    assert counts["a"] == 3 and counts["b"] == 1


# ----------------------------------------------------------- extractall
def test_extractall_named_groups_and_optional(spark):
    pdf = pd.DataFrame({"s": ["a1-b22", "c3", "zz"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    pat = r"(?P<letter>[a-c])(?P<num>\d+)"
    got = ldf["s"].str.extractall(pat).to_pandas()
    want = pdf["s"].str.extractall(pat)
    assert list(got.columns) == list(want.columns) == ["letter", "num"]
    assert sorted(got["letter"].tolist()) == sorted(want["letter"].tolist())
    assert sorted(got["num"].tolist()) == sorted(want["num"].tolist())


def test_extractall_nonparticipating_group_is_null(spark):
    pdf = pd.DataFrame({"s": ["x1", "y"]})
    ldf = lps.from_pandas(pdf, spark=spark)
    pat = r"([xy])(\d)?"
    got = ldf["s"].str.extractall(pat).to_pandas().reset_index(drop=True)
    want = pdf["s"].str.extractall(pat).reset_index(drop=True)
    assert list(got.columns) == ["0", "1"]
    # pandas: non-participating optional group is NaN
    assert got["1"].isna().tolist() == want[1].isna().tolist()
    assert got["0"].tolist() == want[0].tolist()
