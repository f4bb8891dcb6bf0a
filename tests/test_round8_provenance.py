"""Round-8 provenance widening: new non-null proof producers — inner-merge
output keys (plain-equality joins), concat of all-proven inputs, astype on a
proven column — plus a plan pin showing the inner-merge proof feeding an
exchange reuse, and a widened hypothesis fuzz mixing the new producers with
null-key frames (a FALSE proof would flip a merge to plain equality and drop
the NaN==NaN matches pandas keeps — the fuzz would catch it)."""
import re

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from legate_pandas_spark.frontend.frame import concat, from_pandas


def _exchanges(df):
    plan = df._sdf._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)


def test_inner_merge_proves_output_keys(spark):
    pdf = pd.DataFrame({"k": [1.0, 2.0, None], "v": [1.0, 2.0, 3.0]})
    g = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    raw = from_pandas(pdf.rename(columns={"v": "w"}), spark=spark)
    m = g.merge(raw, on="k", how="inner")  # plain equality (left proven)
    assert "k" in m._nonnull_cols
    # but NOT under left join (right nulls can't null k here, but the rule
    # only fires for inner) — left keeps the existing lflags propagation
    ml = g.merge(raw, on="k", how="left")
    assert "k" in ml._nonnull_cols  # still proven via lflags propagation
    # an UNPROVEN inner merge (null-safe equality) must NOT prove keys
    r2 = from_pandas(pdf.rename(columns={"v": "u"}), spark=spark)
    m2 = raw.merge(r2, on="k", how="inner")
    assert "k" not in m2._nonnull_cols


def test_inner_merge_proves_left_on_right_on_keys(spark):
    pdf = pd.DataFrame({"k": [1.0, None, 2.0], "v": [1.0, 2.0, 3.0]})
    g = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    raw = pd.DataFrame({"kk": [1.0, None], "w": [10.0, 20.0]})
    m = g.merge(from_pandas(raw, spark=spark), left_on="k", right_on="kk", how="inner")
    assert "k" in m._nonnull_cols and "kk" in m._nonnull_cols
    # values still pandas-exact
    exp = (
        pdf.groupby("k").agg(v=("v", "sum")).reset_index()
        .merge(raw, left_on="k", right_on="kk", how="inner")
    )
    got = m.to_pandas()
    assert sorted(got["w"]) == sorted(exp["w"])


def test_concat_intersects_proofs(spark):
    pdf = pd.DataFrame({"k": [1.0, None, 2.0], "v": [1.0, 2.0, 3.0]})
    g1 = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    g2 = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "max"}).reset_index()
    raw = from_pandas(pdf, spark=spark)
    both = concat([g1, g2])
    assert "k" in both._nonnull_cols
    mixed = concat([g1, raw])
    assert "k" not in mixed._nonnull_cols
    # correctness: concat of two proven frames merged against null keys
    r = pd.DataFrame({"k": [np.nan, 2.0], "w": [10, 20]})
    got = both.merge(from_pandas(r, spark=spark), on="k", how="inner").to_pandas()
    p1 = pdf.groupby("k").agg(v=("v", "sum")).reset_index()
    p2 = pdf.groupby("k").agg(v=("v", "max")).reset_index()
    exp = pd.concat([p1, p2]).merge(r, on="k", how="inner")
    assert sorted(got["w"]) == sorted(exp["w"])


def test_astype_keeps_proof_except_category(spark):
    pdf = pd.DataFrame({"k": [1.0, None, 2.0], "v": [1.0, 2.0, 3.0]})
    g = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    a = g.astype({"k": "int64"})
    assert "k" in a._nonnull_cols
    c = g.astype({"k": "str"})
    assert "k" in c._nonnull_cols
    cat = g.astype({"k": "category"})
    assert "k" not in cat._nonnull_cols
    # merged downstream, still pandas-exact (int keys vs float-with-null)
    r = pd.DataFrame({"k": [1, 2], "w": [10, 20]})
    got = a.merge(from_pandas(r, spark=spark), on="k", how="inner").to_pandas()
    exp = (
        pdf.groupby("k").agg(v=("v", "sum")).reset_index()
        .astype({"k": "int64"}).merge(r, on="k", how="inner")
    )
    assert sorted(got["w"]) == sorted(exp["w"])


def test_read_parquet_nonnullable_fields_proof(spark, tmp_path):
    """Spark generally force-nullables file scans; the producer must simply
    agree with whatever the scan schema says (no false proofs)."""
    from legate_pandas_spark.frontend.io import read_parquet

    p = str(tmp_path / "t.parquet")
    pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}).to_parquet(p, index=False)
    df = read_parquet(p, spark=spark)
    schema_nonnull = {
        f.name for f in df._sdf.schema.fields if not f.nullable
    }
    assert df._nonnull_cols == frozenset(schema_nonnull)


def test_plan_pin_inner_merge_proof_reuses_exchange(spark):
    """groupby(k) ⋈inner raw → groupby(k) again: the second aggregate must
    reuse the join's plain hash(k) partitioning — no null-safe (coalesce)
    exchange anywhere, and no NEW exchange for the final groupby."""
    # LONG keys: float keys get NaN-normalization wrapping on the join hash
    # (normalizenanandzero), which defeats exchange reuse regardless of
    # provenance — the reuse win is an integer-key property (the mortgage
    # pipeline's loan keys are longs)
    pdf = pd.DataFrame(
        {
            "k": pd.array([i % 7 for i in range(40)], dtype="Int64"),
            "v": np.arange(40, dtype="float64"),
        }
    )
    raw = pdf.copy()
    raw.loc[3, "k"] = pd.NA
    g = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    m = g.merge(
        from_pandas(raw.rename(columns={"v": "w"}), spark=spark),
        on="k",
        how="inner",
        method="hash",
    )
    assert "k" in m._nonnull_cols
    g2 = m.groupby("k").agg({"w": "sum"}).reset_index()
    exs = _exchanges(g2)
    assert not any("coalesce" in e for e in exs), exs
    # exchanges: one for g's aggregate, one to shuffle the raw side into the
    # join — the final groupby adds none (reuses the join's output
    # partitioning on plain hash(k))
    assert len(exs) <= 2, exs


keys = st.lists(st.one_of(st.integers(0, 4), st.none()), min_size=1, max_size=10)
hows = st.sampled_from(["inner", "left", "right", "outer"])


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(lk=keys, rk=keys, mk=keys, how=hows)
def test_fuzz_inner_merge_proof_chain(spark, lk, rk, mk, how):
    """groupby → inner merge (new proof) → merge against a NULL-KEY frame:
    the chained plain-equality decision must stay pandas-exact."""
    lpdf = pd.DataFrame({"k": pd.array(lk, dtype="float64"), "v": 1.0})
    rpdf = pd.DataFrame({"k": pd.array(rk, dtype="float64"), "w": 2.0})
    mpdf = pd.DataFrame({"k": pd.array(mk, dtype="float64"), "z": 3.0})

    pg = lpdf.groupby("k").agg({"v": "sum"}).reset_index()
    pm = pg.merge(rpdf, on="k", how="inner")
    exp = pm.merge(mpdf, on="k", how=how)

    g = from_pandas(lpdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    m = g.merge(from_pandas(rpdf, spark=spark), on="k", how="inner")
    got = m.merge(from_pandas(mpdf, spark=spark), on="k", how=how).to_pandas()

    assert len(got) == len(exp)
    assert sorted(got["z"].fillna(-1)) == sorted(exp["z"].fillna(-1))
    assert sorted(got["w"].fillna(-1)) == sorted(exp["w"].fillna(-1))


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(ak=keys, bk=keys, mk=keys, how=hows, caster=st.sampled_from(["none", "int64", "str"]))
def test_fuzz_concat_astype_proof_chain(spark, ak, bk, mk, how, caster):
    """concat of two groupby outputs (proof intersects) [+ astype] → merge
    against a null-key frame — pandas-exact."""
    apdf = pd.DataFrame({"k": pd.array(ak, dtype="float64"), "v": 1.0})
    bpdf = pd.DataFrame({"k": pd.array(bk, dtype="float64"), "v": 2.0})
    mpdf = pd.DataFrame({"k": pd.array(mk, dtype="float64"), "z": 3.0})

    pa = apdf.groupby("k").agg({"v": "sum"}).reset_index()
    pb = bpdf.groupby("k").agg({"v": "max"}).reset_index()
    pc = pd.concat([pa, pb])
    ga = from_pandas(apdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    gb = from_pandas(bpdf, spark=spark).groupby("k").agg({"v": "max"}).reset_index()
    gc = concat([ga, gb])
    assert "k" in gc._nonnull_cols
    if caster != "none":
        if caster == "int64" and pc["k"].isna().any():
            return  # int cast of missing not defined; cast only valid inputs
        pc = pc.astype({"k": caster})
        gc = gc.astype({"k": caster})
        if caster == "str":
            # align dtypes for the merge comparison frame too
            mpdf_cmp = mpdf.copy()
            mpdf_cmp["k"] = mpdf_cmp["k"].astype("str")
            exp = pc.merge(mpdf_cmp, on="k", how=how)
            mdf = from_pandas(mpdf, spark=spark).astype({"k": "str"})
            got = gc.merge(mdf, on="k", how=how).to_pandas()
            assert len(got) == len(exp)
            return
    exp = pc.merge(mpdf, on="k", how=how)
    got = gc.merge(from_pandas(mpdf, spark=spark), on="k", how=how).to_pandas()
    assert len(got) == len(exp)
    assert sorted(got["z"].fillna(-1)) == sorted(exp["z"].fillna(-1))
