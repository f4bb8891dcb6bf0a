"""Round-9 provenance widening (VERDICT r8 Next #4): where/mask with a
non-null scalar `other`, clip/round/abs (null-preserving numeric maps), and
explode (non-exploded columns) now CARRY column non-null proofs; the exploded
column and null/frame-valued others still drop them. Includes a value-level
soundness fuzz (a false proof = nulls in a proven column) and a plan pin
showing fillna(dict) proofs feeding a plain hash(k) merge."""
import re

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from legate_pandas_spark.frontend.frame import from_pandas


def _proven_frame(spark):
    """A frame with a PROVEN column k (groupby output) and an unproven v."""
    pdf = pd.DataFrame(
        {"k": [1.0, None, 2.0, 2.0], "v": [1.0, 2.0, None, 4.0]}
    )
    g = (
        from_pandas(pdf, spark=spark)
        .groupby("k")
        .agg({"v": "sum"})
        .reset_index()
    )
    assert "k" in g._nonnull_cols
    return g


def test_where_scalar_other_carries_proof(spark):
    g = _proven_frame(spark)
    kept = g.where(g["v"] > 0, 0)
    assert "k" in kept._nonnull_cols
    # default other=None (NaN fill) can introduce nulls -> proofs drop
    dropped = g.where(g["v"] > 0)
    assert "k" not in dropped._nonnull_cols
    # NaN scalar is pandas-missing -> drops too
    nan_other = g.where(g["v"] > 0, float("nan"))
    assert "k" not in nan_other._nonnull_cols


def test_mask_scalar_other_carries_proof(spark):
    g = _proven_frame(spark)
    kept = g.mask(g["v"] > 100, -1)
    assert "k" in kept._nonnull_cols
    assert "k" not in g.mask(g["v"] > 100)._nonnull_cols
    # frame-shaped cond path
    cond = g > 100  # aligned boolean frame
    kept2 = g.mask(cond, -1)
    assert "k" in kept2._nonnull_cols
    assert "k" not in g.mask(cond)._nonnull_cols


def test_clip_round_abs_carry_proofs(spark):
    g = _proven_frame(spark)
    for out in (g.clip(0, 5), g.clip(lower=0), g.round(2), g.abs()):
        assert "k" in out._nonnull_cols
    # and values stay pandas-exact through clip on null-bearing v
    pdf = pd.DataFrame({"k": [1.0, 2.0], "v": [None, 4.0]})
    got = from_pandas(pdf, spark=spark).clip(0, 3).to_pandas()
    exp = pdf.clip(0, 3)
    assert got["v"].isna().tolist() == exp["v"].isna().tolist()


def test_explode_carries_nonexploded_proofs(spark):
    import pyspark.sql.functions as F

    from legate_pandas_spark.frontend.frame import DataFrame

    g2 = (
        from_pandas(
            pd.DataFrame({"k": [1.0, None, 2.0], "v": [1.0, 2.0, 3.0]}),
            spark=spark,
        )
        .groupby("k")
        .agg({"v": "sum"})
        .reset_index()
    )
    arr_frame = DataFrame(
        g2._sdf.withColumn("arr", F.array(F.col("v"), F.col("v") + 1))
    )
    arr_frame._nonnull_cols = g2._nonnull_cols | {"arr"}
    ex = arr_frame.explode("arr")
    assert "k" in ex._nonnull_cols  # non-exploded column keeps its proof
    assert "arr" not in ex._nonnull_cols  # exploded column loses it
    # pandas differential on values
    ppdf = pd.DataFrame({"k": [1.0, 2.0], "v": [1.0, 3.0]}).dropna()
    ppdf = (
        pd.DataFrame({"k": [1.0, None, 2.0], "v": [1.0, 2.0, 3.0]})
        .groupby("k")
        .agg(v=("v", "sum"))
        .reset_index()
    )
    ppdf["arr"] = ppdf["v"].map(lambda x: [x, x + 1])
    exp = ppdf.explode("arr")
    got = ex.to_pandas()
    assert sorted(got["arr"].astype(float)) == sorted(exp["arr"].astype(float))


def test_plan_pin_fillna_dict_merge_plain_hash(spark):
    """fillna({k: 0}) proves k -> groupby -> merge compiles plain hash(k)
    exchanges (no coalesce/isnull null-safe shape) on a long key."""
    pdf = pd.DataFrame(
        {
            "k": pd.array([1, None, 2, 2, 3] * 4, dtype="Int64"),
            "v": np.arange(20, dtype="float64"),
        }
    )
    l = from_pandas(pdf, spark=spark).fillna({"k": 0})
    assert "k" in l._nonnull_cols
    g = l.groupby("k").agg({"v": "sum"}).reset_index()
    r = from_pandas(
        pd.DataFrame({"k": pd.array([0, 1, 2], dtype="Int64"), "w": [9.0, 8.0, 7.0]}),
        spark=spark,
    ).fillna({"k": -1})
    m = g.merge(r, on="k", how="inner", method="hash")
    plan = m._sdf._jdf.queryExecution().executedPlan().toString()
    exs = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert exs and not any("coalesce" in e for e in exs), exs
    # values pandas-exact (fill then merge)
    exp = (
        pdf.fillna({"k": 0}).groupby("k").agg(v=("v", "sum")).reset_index()
        .merge(pd.DataFrame({"k": [0, 1, 2], "w": [9.0, 8.0, 7.0]}), on="k")
    )
    got = m.to_pandas()
    assert sorted(got["w"]) == sorted(exp["w"])


# ------------------------------------------------------------------ fuzz
producers = st.lists(
    st.sampled_from(["where0", "maskneg", "clip", "round", "fillk", "noop"]),
    min_size=0,
    max_size=3,
)
keys = st.lists(st.one_of(st.integers(0, 4), st.none()), min_size=1, max_size=8)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(lk=keys, mk=keys, chain=producers)
def test_fuzz_proof_soundness_through_producers(spark, lk, mk, chain):
    """Random producer chains over a proven frame: every column still
    claiming a proof must be value-level null-free, and a merge against a
    null-key frame stays pandas-exact."""
    lpdf = pd.DataFrame({"k": pd.array(lk, dtype="float64"), "v": 1.0})
    mpdf = pd.DataFrame({"k": pd.array(mk, dtype="float64"), "z": 3.0})

    def apply_chain(df, is_pandas):
        for step in chain:
            if step == "where0":
                cond = df["v"] > 0
                df = df.where(cond, 0)
            elif step == "maskneg":
                cond = df["v"] > 100
                df = df.mask(cond, -1)
            elif step == "clip":
                df = df.clip(-10, 10)
            elif step == "round":
                df = df.round(2)
            elif step == "fillk":
                df = df.fillna({"v": 0})
        return df

    pg = lpdf.groupby("k").agg({"v": "sum"}).reset_index()
    pg = apply_chain(pg, True)
    exp = pg.merge(mpdf, on="k", how="inner")

    g = from_pandas(lpdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    g = apply_chain(g, False)
    # soundness: proven columns are truly null-free
    gpd = g.to_pandas()
    for c in g._nonnull_cols:
        if c in gpd.columns:
            assert not gpd[c].isna().any(), (c, chain)
    got = g.merge(from_pandas(mpdf, spark=spark), on="k", how="inner").to_pandas()
    assert len(got) == len(exp), chain
    assert sorted(got["z"]) == sorted(exp["z"]), chain
