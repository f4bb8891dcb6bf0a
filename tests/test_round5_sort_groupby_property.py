"""Round-5: hypothesis fuzz for sort_values (multi-key, mixed ascending,
na_position, stability) and groupby.agg (random agg-spec dicts) —
differential vs pandas."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


def _pdf(seed):
    rng = np.random.RandomState(seed)
    n = 40
    pdf = pd.DataFrame(
        {
            "g": rng.randint(0, 4, n),
            "a": rng.randn(n).round(2),
            "b": rng.randint(-5, 5, n).astype("float64"),
            "s": [f"s{rng.randint(0, 6)}" for _ in range(n)],
        }
    )
    pdf.loc[rng.choice(n, 5, replace=False), "a"] = np.nan
    return pdf


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 10_000),
    st.lists(st.sampled_from(["a", "b", "s", "g"]), min_size=1, max_size=3, unique=True),
    st.lists(st.booleans(), min_size=3, max_size=3),
    st.sampled_from(["first", "last"]),
)
def test_sort_values_fuzz(spark, seed, by, ascending, na_position):
    pdf = _pdf(seed)
    asc = ascending[: len(by)]
    ldf = lps.from_pandas(pdf, spark=spark)
    got = (
        ldf.sort_values(by=by, ascending=asc, na_position=na_position)
        .to_pandas()
        .reset_index(drop=True)
    )
    want = pdf.sort_values(
        by=by, ascending=asc, na_position=na_position, kind="mergesort"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 10_000),
    st.dictionaries(
        st.sampled_from(["a", "b"]),
        st.sampled_from(["sum", "mean", "min", "max", "count", "std", "var"]),
        min_size=1,
        max_size=2,
    ),
)
def test_groupby_agg_dict_fuzz(spark, seed, spec):
    pdf = _pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.groupby("g").agg(spec).reset_index().to_pandas()
    want = pdf.groupby("g").agg(spec).reset_index()
    got = got.sort_values("g").reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_sort_stability_fresh_frame_descending(spark):
    """Regression: fresh frames (no row-order key yet) must still sort
    STABLY — ties keep original order even for descending keys."""
    pdf = pd.DataFrame({"a": [1.0, 2.0, 1.0, 2.0, 1.0], "tag": list("vwxyz")})
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.sort_values("a", ascending=False).to_pandas()["tag"].tolist()
    want = pdf.sort_values("a", ascending=False, kind="mergesort")["tag"].tolist()
    assert got == want == ["w", "y", "v", "x", "z"]


def test_chained_sort_ties_follow_current_order(spark):
    """pandas mergesort: the SECOND sort's ties preserve the FIRST sort's
    order, not the original frame order."""
    pdf = pd.DataFrame(
        {"a": [3, 1, 2, 1, 3], "b": [0, 0, 0, 0, 0], "tag": list("vwxyz")}
    )
    ldf = lps.from_pandas(pdf, spark=spark)
    got = (
        ldf.sort_values("a").sort_values("b").to_pandas()["tag"].tolist()
    )
    want = (
        pdf.sort_values("a", kind="mergesort")
        .sort_values("b", kind="mergesort")["tag"]
        .tolist()
    )
    assert got == want
