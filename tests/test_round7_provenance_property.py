"""Hypothesis fuzz for the round-7 non-null provenance system: random
pipelines mixing groupby aggregates (which prove keys null-free and flip
merges to plain equality) with frames containing NULL KEYS on the other side
must still match pandas exactly — the plain-equality fast path may never drop
or add a null-key match."""
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from legate_pandas_spark.frontend.frame import from_pandas


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _assert_frames_match(got, exp):
    g, e = _canon(got), _canon(exp)
    assert list(g.columns) == list(e.columns)
    assert len(g) == len(e)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            gv = pd.to_numeric(gv, errors="coerce")
            ev = pd.to_numeric(ev, errors="coerce")
            ok = ((gv - ev).abs() < 1e-9) | (gv.isna() & ev.isna())
        else:
            ok = (gv.astype(str) == ev.astype(str)) | (gv.isna() & ev.isna())
        assert bool(ok.all()), f"col {c}: {g[c].tolist()} vs {e[c].tolist()}"


keys = st.lists(
    st.one_of(st.integers(0, 5), st.none()), min_size=1, max_size=12
)
hows = st.sampled_from(["inner", "left", "right", "outer"])


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(lk=keys, rk=keys, how=hows, agg=st.sampled_from(["sum", "max", "count"]))
def test_groupby_then_merge_with_null_keys(spark, lk, rk, how, agg):
    """Left side: groupby output (keys proven non-null → plain equality).
    Right side: raw frame WITH null keys. pandas: groupby drops null keys;
    merge matches NaN==NaN — the fast path must not change either."""
    lpdf = pd.DataFrame(
        {"k": pd.array(lk, dtype="float64"), "v": np.arange(len(lk), dtype="float64")}
    )
    rpdf = pd.DataFrame(
        {"k": pd.array(rk, dtype="float64"), "w": np.arange(len(rk), dtype="float64")}
    )
    exp_l = lpdf.groupby("k", dropna=True).agg({"v": agg}).reset_index()
    exp = exp_l.merge(rpdf, on="k", how=how)

    gl = from_pandas(lpdf, spark=spark).groupby("k").agg({"v": agg}).reset_index()
    got = gl.merge(from_pandas(rpdf, spark=spark), on="k", how=how).to_pandas()
    _assert_frames_match(got, exp)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(lk=keys, rk=keys, how=hows)
def test_merge_of_two_groupby_outputs(spark, lk, rk, how):
    lpdf = pd.DataFrame({"k": pd.array(lk, dtype="float64"), "v": 1.0})
    rpdf = pd.DataFrame({"k": pd.array(rk, dtype="float64"), "w": 2.0})
    exp = (
        lpdf.groupby("k").agg({"v": "sum"}).reset_index()
        .merge(rpdf.groupby("k").agg({"w": "sum"}).reset_index(), on="k", how=how)
    )
    got = (
        from_pandas(lpdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
        .merge(
            from_pandas(rpdf, spark=spark).groupby("k").agg({"w": "sum"}).reset_index(),
            on="k",
            how=how,
        )
        .to_pandas()
    )
    _assert_frames_match(got, exp)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(lk=keys, rk=keys, how=hows)
def test_invalidation_after_key_overwrite(spark, lk, rk, how):
    """Overwriting the proven key with a NULLABLE column must fall back to
    null-safe equality (NaN==NaN matches again)."""
    lpdf = pd.DataFrame(
        {
            "k": pd.array(lk, dtype="float64"),
            "k2": pd.array(list(reversed(lk)), dtype="float64"),
            "v": 1.0,
        }
    )
    rpdf = pd.DataFrame({"k": pd.array(rk, dtype="float64"), "w": 2.0})
    exp_l = lpdf.groupby("k", dropna=True).agg({"v": "sum", "k2": "max"}).reset_index()
    exp_l["k"] = exp_l["k2"]  # may reintroduce nulls
    exp = exp_l.merge(rpdf, on="k", how=how)

    gl = (
        from_pandas(lpdf, spark=spark)
        .groupby("k")
        .agg({"v": "sum", "k2": "max"})
        .reset_index()
    )
    gl["k"] = gl["k2"]
    got = gl.merge(from_pandas(rpdf, spark=spark), on="k", how=how).to_pandas()
    _assert_frames_match(got, exp)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(lk=keys, rk=keys, how=st.sampled_from(["inner", "left"]))
def test_proof_carried_through_projection_filter_rename(spark, lk, rk, how):
    lpdf = pd.DataFrame({"k": pd.array(lk, dtype="float64"), "v": 1.0})
    rpdf = pd.DataFrame({"kk": pd.array(rk, dtype="float64"), "w": 2.0})
    exp_l = lpdf.groupby("k").agg({"v": "count"}).reset_index()
    exp_l = exp_l[exp_l["v"] > 0][["k", "v"]].rename(columns={"k": "kk"})
    exp = exp_l.merge(rpdf, on="kk", how=how)

    gl = from_pandas(lpdf, spark=spark).groupby("k").agg({"v": "count"}).reset_index()
    gl = gl[gl["v"] > 0][["k", "v"]].rename(columns={"k": "kk"})
    assert "kk" in gl._nonnull_cols
    got = gl.merge(from_pandas(rpdf, spark=spark), on="kk", how=how).to_pandas()
    _assert_frames_match(got, exp)
