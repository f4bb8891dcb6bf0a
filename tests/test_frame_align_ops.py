"""Frame-vs-frame arithmetic with pandas index alignment — extension beyond
the reference's aligned-only contract (README.md:208-218): lineage fast path,
stored-index full-outer join, positional join, fill_value rules.
Differential vs real pandas."""

import numpy as np
import pandas as pd
import pytest

import legate_pandas_spark as lps


def _match(lps_df, pandas_df):
    got = lps_df.to_pandas()
    if got.index.name or isinstance(got.index, pd.MultiIndex):
        got = got.reset_index()
        pandas_df = pandas_df.reset_index()
    got = got[list(pandas_df.columns)]
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    pandas_df = pandas_df.sort_values(list(pandas_df.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, pandas_df, check_dtype=False)


@pytest.fixture()
def pair(spark):
    p1 = pd.DataFrame({"k": [1, 2, 3, 4], "a": [1.0, 2.0, np.nan, 4.0], "b": [10.0, 20.0, 30.0, 40.0]}).set_index("k")
    p2 = pd.DataFrame({"k": [2, 3, 4, 5], "a": [5.0, np.nan, 7.0, 8.0], "c": [1.0, 2.0, 3.0, 4.0]}).set_index("k")
    l1 = lps.from_pandas(p1.reset_index(), spark=spark).set_index("k")
    l2 = lps.from_pandas(p2.reset_index(), spark=spark).set_index("k")
    return l1, l2, p1, p2


def test_add_lineage_fast_path(pair):
    l1, _, p1, _ = pair
    _match(l1 + (l1 * 2), p1 + (p1 * 2))


def test_add_indexed_outer_align(pair):
    l1, l2, p1, p2 = pair
    _match(l1 + l2, p1 + p2)


def test_add_fill_value(pair):
    l1, l2, p1, p2 = pair
    _match(l1.add(l2, fill_value=0), p1.add(p2, fill_value=0))


def test_sub_mul_div_indexed(pair):
    l1, l2, p1, p2 = pair
    _match(l1.sub(l2, fill_value=1), p1.sub(p2, fill_value=1))
    _match(l1.mul(l2, fill_value=2), p1.mul(p2, fill_value=2))
    _match(l1.div(l2, fill_value=1), p1.div(p2, fill_value=1))


def test_positional_align(spark):
    p1 = pd.DataFrame({"a": [1.0, 2.0, 3.0]})
    p2 = pd.DataFrame({"a": [10.0, 20.0, 30.0, 40.0]})
    l1 = lps.from_pandas(p1, spark=spark)
    l2 = lps.from_pandas(p2, spark=spark)
    _match(l1 + l2, p1 + p2)


def test_compare_aligned_frames(pair):
    l1, _, p1, _ = pair
    got = ((l1 * 2) > l1).to_pandas().reset_index()
    want = ((p1 * 2) > p1).reset_index()
    got = got.sort_values("k").reset_index(drop=True)[list(want.columns)]
    pd.testing.assert_frame_equal(got, want.sort_values("k").reset_index(drop=True), check_dtype=False)


def test_compare_unaligned_raises(pair):
    l1, l2, _, _ = pair
    with pytest.raises(ValueError):
        _ = l1 == l2


def test_mixed_index_raises(spark, pair):
    l1, _, _, _ = pair
    lv = lps.from_pandas(pd.DataFrame({"a": [1.0]}), spark=spark)
    with pytest.raises(ValueError):
        _ = l1 + lv


def test_scalar_reversed(spark):
    p = pd.DataFrame({"a": [1.0, 2.0, 4.0]})
    l = lps.from_pandas(p, spark=spark)
    _match(10 - l, 10 - p)
    _match(10 / l, 10 / p)
