"""Round-6: hypothesis fuzz of the join surface the round-5 sweep didn't
reach — merge result VALUES under key dtype unification (int32/int64/float64
mixes), how='right', multi-key merges with null+duplicate keys, and the
backward as-of join vs pandas.merge_asof with random timestamps/tolerances
(operators/asof.py — the union+window formulation)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import legate_pandas_spark as lps
from legate_pandas_spark.operators.asof import asof_join


def _canon(pdf):
    pdf = pdf.copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].where(pdf[c].notna(), "<NA>").astype(str)
        else:
            pdf[c] = pd.to_numeric(pdf[c], errors="coerce").astype("float64")
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return (
        pdf.fillna(-987654.0)
        .sort_values(by=list(pdf.columns), kind="mergesort")
        .reset_index(drop=True)
    )


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 10_000),
    st.sampled_from(["inner", "left", "right", "outer"]),
    st.sampled_from(["int32", "int64", "float64"]),
    st.sampled_from(["int32", "int64", "float64"]),
)
def test_merge_dtype_unification_values(spark, seed, how, ldt, rdt):
    rng = np.random.RandomState(seed)
    lk = rng.randint(0, 5, size=9)
    rk = rng.randint(0, 5, size=7)
    left = pd.DataFrame({"k": lk.astype(ldt), "v": rng.randn(9).round(3)})
    right = pd.DataFrame({"k": rk.astype(rdt), "w": rng.randn(7).round(3)})
    want = left.merge(right, on="k", how=how)
    got = (
        lps.from_pandas(left, spark=spark)
        .merge(lps.from_pandas(right, spark=spark), on="k", how=how)
        .to_pandas()
    )
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 10_000),
    st.sampled_from(["inner", "left", "right", "outer"]),
    st.booleans(),
)
def test_merge_multikey_values(spark, seed, how, null_keys):
    rng = np.random.RandomState(seed)
    n_l, n_r = 10, 8
    lk1 = [int(x) for x in rng.randint(0, 3, n_l)]
    lk2 = [f"g{x}" for x in rng.randint(0, 3, n_l)]
    rk1 = [int(x) for x in rng.randint(0, 3, n_r)]
    rk2 = [f"g{x}" for x in rng.randint(0, 3, n_r)]
    left = pd.DataFrame(
        {
            "k1": pd.array(lk1, dtype="Int64"),
            "k2": lk2,
            "v": rng.randn(n_l).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "k1": pd.array(rk1, dtype="Int64"),
            "k2": rk2,
            "w": rng.randn(n_r).round(3),
        }
    )
    if null_keys:
        left.loc[1, "k1"] = None
        left.loc[3, "k2"] = None
        right.loc[0, "k1"] = None
        right.loc[2, "k2"] = None
    want = left.merge(right, on=["k1", "k2"], how=how)
    got = (
        lps.from_pandas(left, spark=spark)
        .merge(lps.from_pandas(right, spark=spark), on=["k1", "k2"], how=how)
        .to_pandas()
    )
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(_canon(got), _canon(want), check_dtype=False)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 10_000),
    st.one_of(st.none(), st.integers(1, 50)),
    st.integers(1, 3),
)
def test_asof_join_matches_merge_asof(spark, seed, tol, n_groups):
    rng = np.random.RandomState(seed)
    n_l, n_r = 12, 10
    # unique right timestamps per group — pandas/our tie order between
    # duplicate right rows at the SAME (by, ts) is unspecified in both
    lt = rng.randint(0, 500, n_l)
    groups_l = rng.randint(0, n_groups, n_l)
    groups_r = rng.randint(0, n_groups, n_r)
    rt = {}
    rts = []
    for g in groups_r:
        t = int(rng.randint(0, 500))
        while (g, t) in rt:
            t = (t + 1) % 500
        rt[(g, t)] = True
        rts.append(t)
    left = pd.DataFrame(
        {
            "uid": groups_l.astype("int64"),
            "ts": pd.to_datetime(lt, unit="s"),
            "lv": np.arange(n_l, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "uid": groups_r.astype("int64"),
            "ts": pd.to_datetime(rts, unit="s"),
            "rv": np.arange(100, 100 + n_r, dtype="int64"),
        }
    )
    kwargs = {}
    if tol is not None:
        kwargs["tolerance"] = pd.Timedelta(seconds=tol)
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="uid",
        direction="backward",
        **kwargs,
    )
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="ts",
        by="uid",
        right_value_cols=["rv"],
        tolerance_seconds=float(tol) if tol is not None else None,
    ).toPandas()
    g = got.sort_values(["uid", "ts", "lv"], kind="mergesort").reset_index(drop=True)
    w = want.sort_values(["uid", "ts", "lv"], kind="mergesort").reset_index(drop=True)
    assert g["rv"].astype("float64").fillna(-1).tolist() == w["rv"].astype(
        "float64"
    ).fillna(-1).tolist(), (g, w)
