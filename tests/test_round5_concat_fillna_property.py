"""Round-5: hypothesis fuzz for concat (axis=0 union-of-frames with missing
columns — reference README:194-196 contract) and fillna/dropna
(how/thresh/subset) — differential vs pandas."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps


def _frames(seed, drop_col_b):
    rng = np.random.RandomState(seed)
    f1 = pd.DataFrame({"a": rng.randn(7).round(2), "b": rng.randn(7).round(2)})
    f2 = pd.DataFrame({"a": rng.randn(5).round(2), "b": rng.randn(5).round(2)})
    if drop_col_b:
        f2 = f2[["a"]]
    return f1, f2


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000), st.booleans())
def test_concat_rows_fuzz(spark, seed, drop_col_b):
    f1, f2 = _frames(seed, drop_col_b)
    l1 = lps.from_pandas(f1, spark=spark)
    l2 = lps.from_pandas(f2, spark=spark)
    got = lps.concat([l1, l2]).to_pandas().reset_index(drop=True)
    want = pd.concat([f1, f2], ignore_index=True)
    got = got.fillna(-999).sort_values(["a", "b"]).reset_index(drop=True)
    want = want.fillna(-999).sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _null_pdf(seed):
    rng = np.random.RandomState(seed)
    n = 25
    pdf = pd.DataFrame(
        {
            "x": rng.randn(n).round(2),
            "y": rng.randn(n).round(2),
            "z": rng.randn(n).round(2),
        }
    )
    for c in pdf.columns:
        pdf.loc[rng.choice(n, rng.randint(2, 8), replace=False), c] = np.nan
    return pdf


@settings(max_examples=12, deadline=None)
@given(
    st.integers(0, 10_000),
    st.sampled_from(["any", "all"]),
    st.sampled_from([None, ["x"], ["x", "y"]]),
)
def test_dropna_how_subset_fuzz(spark, seed, how, subset):
    pdf = _null_pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.dropna(how=how, subset=subset).to_pandas().reset_index(drop=True)
    want = pdf.dropna(how=how, subset=subset).reset_index(drop=True)
    got = got.fillna(-999).sort_values(list(got.columns)).reset_index(drop=True)
    want = want.fillna(-999).sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 3))
def test_dropna_thresh_fuzz(spark, seed, thresh):
    pdf = _null_pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    got = ldf.dropna(thresh=thresh).to_pandas()
    want = pdf.dropna(thresh=thresh)
    assert len(got) == len(want)


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 10_000))
def test_fillna_dict_fuzz(spark, seed):
    pdf = _null_pdf(seed)
    ldf = lps.from_pandas(pdf, spark=spark)
    spec = {"x": 0.0, "z": -1.0}
    got = ldf.fillna(spec).to_pandas().reset_index(drop=True)
    want = pdf.fillna(spec).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.fillna(-999), want.fillna(-999), check_dtype=False
    )
