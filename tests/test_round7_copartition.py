"""Round-7 partition-key reuse (the facade analog of the reference's tracked
`_partition_keys`, reference core/table.py:222-268, core/merge.py:296-354).

The facade proves columns null-free where it can (groupby dropna key outputs,
propagated through value-preserving ops) and compiles merges on such keys with
PLAIN equality instead of null-safe equality. Plain keys hash-partition as
hash(k), so Catalyst reuses the upstream groupby's exchange instead of
re-shuffling on (coalesce(k), isnull(k)).

Pins here:
1. semantics — NaN-key merges still match NaN==NaN when no proof exists;
2. invalidation — a value write drops the proof (merge returns to null-safe);
3. plans — groupby→merge→groupby chains add no extra exchange on the key.
"""
import re

import pandas as pd
import pytest

import pyspark.sql.functions as F

from legate_pandas_spark.frontend.frame import from_pandas


def _exchanges(df, spark=None):
    plan = df._sdf._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)


def test_groupby_merge_plain_equality(spark):
    pdf = pd.DataFrame({"k": [1, 2, 1, 3], "v": [1.0, 2.0, 3.0, 4.0]})
    l = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    r = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "max"}).reset_index()
    m = l.merge(r, on="k", how="left", method="hash")
    exs = _exchanges(m)
    # no exchange may hash on the null-safe (coalesce, isnull) shape — the
    # groupby outputs prove k non-null, so the join reuses hash(k)
    assert not any("coalesce" in e for e in exs), exs
    got = m.to_pandas().sort_values("k")
    exp = (
        pdf.groupby("k").agg(v=("v", "sum")).reset_index()
        .merge(pdf.groupby("k").agg(v=("v", "max")).reset_index(), on="k", how="left")
    ).sort_values("k")
    assert got["v_x"].tolist() == exp["v_x"].tolist()
    assert got["v_y"].tolist() == exp["v_y"].tolist()


def test_nan_key_merge_still_matches(spark):
    import numpy as np

    l = pd.DataFrame({"k": [1.0, np.nan, 2.0], "a": [1, 2, 3]})
    r = pd.DataFrame({"k": [np.nan, 2.0], "b": [10, 20]})
    got = (
        from_pandas(l, spark=spark)
        .merge(from_pandas(r, spark=spark), on="k")
        .to_pandas()
        .sort_values("a")
    )
    exp = l.merge(r, on="k").sort_values("a")
    assert len(got) == len(exp) == 2
    assert got["b"].tolist() == exp["b"].tolist()


def test_value_write_invalidates_nonnull_proof(spark):
    pdf = pd.DataFrame({"k": [1, 2, 1], "v": [1.0, 2.0, 3.0]})
    g = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    assert "k" in g._nonnull_cols
    g["k"] = g["v"]  # value write: proof must die
    assert "k" not in g._nonnull_cols


def test_projection_and_rename_carry_proof(spark):
    pdf = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    g = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    assert "k" in g[["k", "v"]]._nonnull_cols
    assert "kk" in g.rename(columns={"k": "kk"})._nonnull_cols
    assert "k" in g[g["v"] > 0]._nonnull_cols


def test_left_merge_propagates_left_proof_only(spark):
    pdf = pd.DataFrame({"k": [1, 2, 1], "v": [1.0, 2.0, 3.0]})
    l = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    r = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "max"}).reset_index()
    m = l.merge(r, on="k", how="left")
    assert "k" in m._nonnull_cols  # left key survives a left join
    mo = l.merge(r, on="k", how="outer")
    assert not mo._nonnull_cols  # outer propagates nothing


def test_merge_method_hash_forces_partitioned_join(spark):
    pdf = pd.DataFrame({"k": [1, 2, 1, 3], "v": [1.0, 2.0, 3.0, 4.0]})
    l = from_pandas(pdf, spark=spark)
    r = from_pandas(pdf.groupby("k", as_index=False).agg(w=("v", "max")), spark=spark)
    m = l.merge(r, on="k", method="hash")
    plan = m._sdf._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
    with pytest.raises(ValueError, match="invalid merge method"):
        l.merge(r, on="k", method="nope")


def test_groupby_chain_single_exchange_on_key(spark):
    """groupby(k) → merge(k, hash) between two such outputs: exactly the two
    aggregate exchanges, none added by the join (partition reuse)."""
    pdf = pd.DataFrame({"k": list(range(50)) * 2, "v": [float(i) for i in range(100)]})
    l = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "sum"}).reset_index()
    r = from_pandas(pdf, spark=spark).groupby("k").agg({"v": "min"}).reset_index()
    m = l.merge(r, on="k", method="hash")
    exs = _exchanges(m)
    assert len(exs) == 2, exs  # one per aggregate, zero for the join


def test_dropna_any_proves_subset_nonnull(spark):
    import numpy as np

    pdf = pd.DataFrame({"k": [1.0, None, 2.0], "v": [1.0, 2.0, None]})
    ldf = from_pandas(pdf, spark=spark)
    d = ldf.dropna(subset=["k"])
    assert "k" in d._nonnull_cols and "v" not in d._nonnull_cols
    d_all = ldf.dropna(how="all")
    assert not d_all._nonnull_cols
    # correctness with a null-keyed right side stays pandas-exact
    r = pd.DataFrame({"k": [np.nan, 2.0], "w": [10, 20]})
    got = d.merge(from_pandas(r, spark=spark), on="k", how="left").to_pandas()
    exp = pdf.dropna(subset=["k"]).merge(r, on="k", how="left")
    assert sorted(got["w"].fillna(-1)) == sorted(exp["w"].fillna(-1))


def test_fillna_proves_matching_columns_only(spark):
    pdf = pd.DataFrame({"k": [1.0, None], "s": ["a", None]})
    ldf = from_pandas(pdf, spark=spark)
    f = ldf.fillna(0.0)
    assert "k" in f._nonnull_cols and "s" not in f._nonnull_cols
    fd = ldf.fillna({"s": "zz"})
    assert "s" in fd._nonnull_cols and "k" not in fd._nonnull_cols
    # values right
    assert f.to_pandas()["k"].tolist() == [1.0, 0.0]
    assert fd.to_pandas()["s"].tolist() == ["a", "zz"]


def test_mortgage_loan_exchanges_are_plain(spark):
    """pd_mortgage_e2e_full plan pin (round-7 verdict item #1): the loan-key
    lineage must hash-partition on PLAIN l_orderkey (provenance fast path) —
    null-safe (coalesce, isnull) loan exchanges defeat every reuse. Allows a
    small residue for joins against unproven scan sides."""
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    df = QUERIES["pd_mortgage_e2e_full"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    nullsafe_loan = plan.count("Exchange hashpartitioning(coalesce(l_orderkey")
    plain_loan = len(
        [
            1
            for line in plan.splitlines()
            if "Exchange hashpartitioning(l_orderkey" in line
        ]
    )
    assert nullsafe_loan == 0, f"null-safe loan exchanges leaked back: {nullsafe_loan}"
    assert plain_loan >= 3  # the groupby/merge chain runs on plain hash(loan)
