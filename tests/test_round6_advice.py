"""Round-6 regression pins for the round-5 ADVICE findings.

1. reindex(index=...) must re-stamp __row_order__ from the label position
   (stale order key after sort_values previously won).
2. GroupBy.ngroup must be positionally aligned with the source frame.
3. findall / count must rewrite (?P=name) backreferences for the JVM engine
   (and count must not renumber backrefs by wrapping the pattern).
4. DataFrame.compare raises on length mismatch like pandas.
"""
import pandas as pd
import pytest

from legate_pandas_spark.frontend.frame import from_pandas


def test_reindex_after_sort_values_uses_label_order(spark):
    pdf = pd.DataFrame({"k": ["c", "a", "b"], "v": [3, 1, 2]})
    ldf = from_pandas(pdf, spark=spark).sort_values("v").set_index("k")
    got = ldf.reindex(index=["b", "c", "a", "zz"]).to_pandas()
    exp = pdf.set_index("k").sort_values("v").reindex(["b", "c", "a", "zz"])
    assert list(got.index) == list(exp.index)
    assert got["v"].fillna(-1).tolist() == exp["v"].fillna(-1).tolist()


def test_reindex_fill_rows_sort_last_not_first(spark):
    # fill rows (absent labels) must take their requested position, not
    # null-sort to the front
    pdf = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}).set_index("k")
    ldf = from_pandas(pdf.reset_index(), spark=spark).set_index("k")
    got = ldf.reindex(index=["zz", "a"]).to_pandas()
    assert list(got.index) == ["zz", "a"]


def test_ngroup_positionally_aligned(spark):
    pdf = pd.DataFrame({"g": ["b", "a", "b", "c", "a"], "v": range(5)})
    ldf = from_pandas(pdf, spark=spark)
    got = ldf.groupby("g").ngroup().to_pandas()
    exp = pdf.groupby("g").ngroup()
    assert got.tolist() == exp.tolist()


def test_findall_named_backreference(spark):
    ps = pd.Series(["abcabc xyz", "qq ss", "no pair"])
    s = from_pandas(ps.to_frame("t"), spark=spark)["t"]
    pat = r"(?P<c>\w)(?P=c)"
    got = s.str.findall(pat).to_pandas()
    exp = ps.str.findall(pat)
    assert [list(x) for x in got] == [list(x) for x in exp]


def test_str_count_backreference_not_renumbered(spark):
    ps = pd.Series(["abcabc xyz", "qq ss tt", "no pair"])
    s = from_pandas(ps.to_frame("t"), spark=spark)["t"]
    pat = r"(?P<c>\w)(?P=c)"
    assert s.str.count(pat).to_pandas().tolist() == ps.str.count(pat).tolist()
    assert (
        s.str.count(r"\w+").to_pandas().tolist() == ps.str.count(r"\w+").tolist()
    )


def test_compare_length_mismatch_raises(spark):
    a = from_pandas(pd.DataFrame({"x": [1, 2, 3]}), spark=spark)
    b = from_pandas(pd.DataFrame({"x": [1, 2]}), spark=spark)
    with pytest.raises(ValueError, match="identically-labeled"):
        a.compare(b)
