"""Round-9 breadth: wide_to_long and json_normalize (module-level pandas
parity, differential-tested — VERDICT r8 Next #7 picked the two reshape/IO
stragglers a pipeline user actually reaches for)."""
import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


def _cmp(got_ldf, exp_pdf, sort_cols):
    got = got_ldf.reset_index().to_pandas()
    exp = exp_pdf.reset_index()
    got = got.sort_values(sort_cols).reset_index(drop=True)[exp.columns.tolist()]
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_wide_to_long_basic(spark):
    pdf = pd.DataFrame(
        {
            "famid": [1, 1, 2, 2],
            "birth": [1, 2, 1, 2],
            "ht1": [2.8, 2.9, 2.2, 2.0],
            "ht2": [3.4, 3.8, 2.9, 3.2],
        }
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.wide_to_long(ldf, "ht", i=["famid", "birth"], j="age")
    exp = pd.wide_to_long(pdf, "ht", i=["famid", "birth"], j="age")
    assert got._index == ("famid", "birth", "age")
    _cmp(got, exp, ["famid", "birth", "age"])


def test_wide_to_long_multi_stub_missing_combo_extras(spark):
    pdf = pd.DataFrame(
        {
            "famid": [1, 1],
            "birth": [1, 2],
            "ht1": [2.8, 2.9],
            "ht2": [3.4, 3.8],
            "wt1": [10.0, 11.0],  # wt2 missing -> NaN rows
            "extra": ["a", "b"],
        }
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.wide_to_long(ldf, ["ht", "wt"], i=["famid", "birth"], j="age")
    exp = pd.wide_to_long(pdf, ["ht", "wt"], i=["famid", "birth"], j="age")
    _cmp(got, exp, ["famid", "birth", "age"])


def test_wide_to_long_sep_and_string_suffix(spark):
    pdf = pd.DataFrame({"id": [1, 2], "A_one": [1, 2], "A_two": [3, 4]})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.wide_to_long(ldf, "A", i="id", j="grp", sep="_", suffix=".+")
    exp = pd.wide_to_long(pdf, "A", i="id", j="grp", sep="_", suffix=".+")
    _cmp(got, exp, ["id", "grp"])
    # string suffixes stay strings
    assert dict(got.reset_index()._sdf.dtypes)["grp"] == "string"


def test_wide_to_long_duplicate_i_raises(spark):
    pdf = pd.DataFrame({"id": [1, 1], "A1": [1.0, 2.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    with pytest.raises(ValueError, match="uniquely identify"):
        lps.wide_to_long(ldf, "A", i="id", j="t")


def test_wide_to_long_no_match_raises(spark):
    pdf = pd.DataFrame({"id": [1], "B1": [1.0]})
    ldf = lps.from_pandas(pdf, spark=spark)
    with pytest.raises(ValueError):
        lps.wide_to_long(ldf, "A", i="id", j="t")


def test_wide_to_long_plan_is_single_stack_no_shuffle(spark):
    pdf = pd.DataFrame(
        {"id": [1, 2], "x1": [1.0, 2.0], "x2": [3.0, 4.0]}
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.wide_to_long(ldf, "x", i="id", j="t")
    plan = got._sdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow generate, shuffle-free


def test_json_normalize_flat_and_nested(spark):
    data = [
        {"id": 1, "info": {"name": "a", "score": 1.5}},
        {"id": 2, "info": {"name": "b", "score": 2.5}},
    ]
    got = lps.json_normalize(data, spark=spark).to_pandas()
    exp = pd.json_normalize(data)
    pd.testing.assert_frame_equal(
        got.sort_values("id").reset_index(drop=True)[exp.columns.tolist()],
        exp.sort_values("id").reset_index(drop=True),
        check_dtype=False,
    )


def test_json_normalize_record_path_meta(spark):
    data = [
        {"state": "FL", "counties": [{"name": "Dade", "pop": 12}, {"name": "Broward", "pop": 40}]},
        {"state": "OH", "counties": [{"name": "Summit", "pop": 1}]},
    ]
    got = lps.json_normalize(
        data, record_path="counties", meta=["state"], spark=spark
    ).to_pandas()
    exp = pd.json_normalize(data, record_path="counties", meta=["state"])
    pd.testing.assert_frame_equal(
        got.sort_values(["state", "name"]).reset_index(drop=True)[exp.columns.tolist()],
        exp.sort_values(["state", "name"]).reset_index(drop=True),
        check_dtype=False,
    )


# ------------------------------------------------------------------ fuzz
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(1, 8),
    stubs=st.lists(
        st.sampled_from(["ht", "wt", "xx"]), min_size=1, max_size=3, unique=True
    ),
    suffixes=st.lists(st.integers(1, 4), min_size=1, max_size=3, unique=True),
    drop=st.booleans(),
)
def test_fuzz_wide_to_long_matches_pandas(spark, n, stubs, suffixes, drop):
    """Random stub/suffix grids (optionally with one missing stub column)
    against pd.wide_to_long — values, nulls, and index structure."""
    cols = {"id": list(range(n))}
    made = []
    for s in stubs:
        for x in suffixes:
            made.append(f"{s}{x}")
            cols[f"{s}{x}"] = [float(i * 10 + x) for i in range(n)]
    if drop and len(made) > 1:
        cols.pop(made[-1])  # missing combo -> NaN rows
    pdf = pd.DataFrame(cols)
    ldf = lps.from_pandas(pdf, spark=spark)
    got = lps.wide_to_long(ldf, stubs, i="id", j="t")
    exp = pd.wide_to_long(pdf, stubs, i="id", j="t")
    _cmp(got, exp, ["id", "t"])
