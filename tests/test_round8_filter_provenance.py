"""Round-8 provenance widening #2: boolean-mask filters and query() as
non-null proof producers, plus pandas-exact NaN semantics for query()
comparison atoms.

A mask filter keeps only rows where the mask is TRUE; the facade's
comparisons/isin/between compile null->false, so surviving rows prove the
operand columns non-null (frame._nonnull_cols -> merge plain-equality fast
path -> exchange reuse). query() comparison atoms now compile TOTAL
(null->false; != / not-in null->true) matching pandas NaN behavior, which
bare SQL three-valued logic did not (`not (k == 1)` dropped NaN rows).
"""
import re

import numpy as np
import pandas as pd
import pytest

from legate_pandas_spark.frontend.frame import from_pandas


def _exchanges(df):
    plan = df._sdf._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)


@pytest.fixture()
def nulls_pdf():
    return pd.DataFrame(
        {
            "k": [1.0, np.nan, 2.0, 3.0, np.nan],
            "v": [10.0, 20.0, 30.0, np.nan, 50.0],
            "flag": [True, None, False, True, True],
            "s": ["a", None, "b", "c", "a"],
        }
    )


# ---------------------------------------------------------------- mask proofs
def test_comparison_mask_proves(spark, nulls_pdf):
    df = from_pandas(nulls_pdf, spark=spark)
    assert "k" in df[df["k"] > 1]._nonnull_cols
    assert "k" in df[df["k"] == 2]._nonnull_cols
    # facade != follows pandas (NaN != 1 is True, rows kept) -> no proof,
    # matching query()'s total-atom semantics (round-9 ADVICE alignment)
    assert "k" not in df[df["k"] != 1]._nonnull_cols
    # column-vs-column comparison proves both sides
    out = df[df["k"] < df["v"]]
    assert {"k", "v"} <= out._nonnull_cols


def test_arithmetic_strictness_propagates(spark, nulls_pdf):
    df = from_pandas(nulls_pdf, spark=spark)
    assert "k" in df[(df["k"] + 1) * 2 > 0]._nonnull_cols
    assert {"k", "v"} <= df[df["k"] - df["v"] > -100]._nonnull_cols
    # fillna breaks strictness: no proof
    assert "k" not in df[df["k"].fillna(0) > -1]._nonnull_cols


def test_predicate_masks_prove(spark, nulls_pdf):
    df = from_pandas(nulls_pdf, spark=spark)
    assert "k" in df[df["k"].notna()]._nonnull_cols
    assert "k" in df[df["k"].isin([1.0, 2.0, None])]._nonnull_cols
    assert "k" in df[df["k"].between(0, 5)]._nonnull_cols
    assert "k" not in df[df["k"].isna()]._nonnull_cols


def test_boolean_column_and_combinators(spark, nulls_pdf):
    df = from_pandas(nulls_pdf, spark=spark)
    # a plain boolean column as mask: true => non-null
    assert "flag" in df[df["flag"]]._nonnull_cols
    # ~flag: true => flag was false (non-null)
    assert "flag" in df[~df["flag"]]._nonnull_cols
    # ~comparison proves NOTHING: null_compare_false(k>1) is false on null k,
    # so the negation is TRUE exactly on the null rows
    neg = df[~(df["k"] > 1)]
    assert "k" not in neg._nonnull_cols
    # & unions proofs; | intersects
    assert {"k", "v"} <= df[(df["k"] > 0) & (df["v"] > 0)]._nonnull_cols
    both = df[(df["k"] > 0) | (df["v"] > 0)]
    assert "k" not in both._nonnull_cols and "v" not in both._nonnull_cols
    same = df[(df["k"] > 0) | (df["k"] < 0)]
    assert "k" in same._nonnull_cols


def test_mask_proof_is_true_no_nulls_survive(spark, nulls_pdf):
    """The proof must never be false: every proven column really has no
    nulls after the filter (value-level check, not just metadata)."""
    df = from_pandas(nulls_pdf, spark=spark)
    cases = [
        df[df["k"] > 1],
        df[~df["flag"]],
        df[(df["k"] > 0) & (df["v"] > 0)],
        df[df["k"].isin([1.0, 2.0])],
    ]
    for out in cases:
        for c in out._nonnull_cols:
            got = out.to_pandas()
            assert not got[c].isna().any(), (c, got)


def test_loc_mask_inherits_proof(spark, nulls_pdf):
    df = from_pandas(nulls_pdf, spark=spark)
    assert "k" in df.loc[df["k"] > 1]._nonnull_cols


# ---------------------------------------------------------------- query()
def test_query_proves_null_rejecting_atoms(spark, nulls_pdf):
    df = from_pandas(nulls_pdf, spark=spark)
    assert "k" in df.query("k > 1")._nonnull_cols
    assert {"k", "v"} <= df.query("k > 0 and v < 100")._nonnull_cols
    assert "k" in df.query("k > 0 or k < 100")._nonnull_cols
    out = df.query("k > 0 or v < 100")
    assert "k" not in out._nonnull_cols and "v" not in out._nonnull_cols
    # != / not-in keep NaN rows (pandas) -> no proof
    assert "k" not in df.query("k != 1")._nonnull_cols
    assert "k" not in df.query("not (k == 1)")._nonnull_cols
    assert "k" not in df.query("k not in [1.0]")._nonnull_cols
    # arithmetic and chained comparisons
    assert "k" in df.query("0 < k <= 3")._nonnull_cols
    assert {"k", "v"} <= df.query("k + v > 0")._nonnull_cols


@pytest.mark.parametrize(
    "expr",
    [
        "k > 1",
        "k != 1",
        "not (k == 1)",
        "k == 1 or v == 20",
        "k != 1 and v != 20",
        "k in [1.0, 3.0]",
        "k not in [1.0, 3.0]",
        "not (k > 1 or v < 25)",
        "0 < k <= 3",
        "k + v > 25",
    ],
)
def test_query_nan_semantics_match_pandas(spark, nulls_pdf, expr):
    pdf = nulls_pdf[["k", "v"]].copy()
    pdf["rid"] = range(len(pdf))
    exp = pdf.query(expr)["rid"].tolist()
    got = from_pandas(pdf, spark=spark).query(expr).to_pandas()["rid"].tolist()
    assert sorted(got) == sorted(exp), expr


def test_query_proof_never_false(spark, nulls_pdf):
    df = from_pandas(nulls_pdf, spark=spark)
    for expr in ["k > 0", "k == 1 or k == 2", "k in [1.0, 2.0]", "0 < k < 5 and v > 0"]:
        out = df.query(expr)
        for c in out._nonnull_cols:
            assert not out.to_pandas()[c].isna().any(), (expr, c)


# ----------------------------------------------------------------- plan pin
def test_filter_then_groupby_merge_reuses_exchange(spark):
    """The headline win: df[df.k > 0] proves k, so groupby(k) -> merge(on=k)
    compiles plain hash(k) exchanges (no coalesce/isnull null-safe shape)."""
    pdf = pd.DataFrame(
        {"k": [1.0, np.nan, 2.0, 2.0, 3.0], "v": [1.0, 2.0, 3.0, 4.0, 5.0]}
    )
    df = from_pandas(pdf, spark=spark)
    flt = df[df["k"] > 0]
    agg = flt.groupby("k").agg({"v": "sum"}).reset_index()
    merged = agg.merge(flt, on="k", how="inner")
    exchanges = _exchanges(merged)
    assert not any("coalesce" in e or "isnull" in e for e in exchanges), exchanges
    # values still pandas-exact
    pf = pdf[pdf.k > 0]
    exp = pf.groupby("k").agg(v=("v", "sum")).reset_index().merge(
        pf, on="k", how="inner"
    )
    got = merged.to_pandas()
    assert len(got) == len(exp)


# ----------------------------------------------------------------- fuzz
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_keys = st.lists(st.one_of(st.integers(0, 5), st.none()), min_size=1, max_size=12)
_hows = st.sampled_from(["inner", "left", "right", "outer"])


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _match(got, exp):
    g, e = _canon(got), _canon(exp)
    assert len(g) == len(e), (g, e)
    for c in g.columns:
        gv = pd.to_numeric(g[c], errors="coerce")
        ev = pd.to_numeric(e[c], errors="coerce")
        ok = ((gv - ev).abs() < 1e-9) | (gv.isna() & ev.isna())
        assert bool(ok.all()), f"col {c}: {g[c].tolist()} vs {e[c].tolist()}"


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(lk=_keys, rk=_keys, how=_hows, thresh=st.integers(0, 5))
def test_fuzz_mask_filter_then_merge(spark, lk, rk, how, thresh):
    """Mask filter as the proof producer: df[df.k >= t] proves k, the merge
    takes the plain-equality path; the other side has NULL keys. pandas
    matches NaN==NaN in merge, but the filtered side has no NaN left, so
    plain equality is exactly equivalent — a FALSE proof would diverge."""
    lpdf = pd.DataFrame(
        {"k": pd.array(lk, dtype="float64"), "v": np.arange(len(lk), dtype="float64")}
    )
    rpdf = pd.DataFrame(
        {"k": pd.array(rk, dtype="float64"), "w": np.arange(len(rk), dtype="float64")}
    )
    exp = lpdf[lpdf.k >= thresh].merge(rpdf, on="k", how=how)
    fl = from_pandas(lpdf, spark=spark)
    fl = fl[fl["k"] >= thresh]
    assert "k" in fl._nonnull_cols
    got = fl.merge(from_pandas(rpdf, spark=spark), on="k", how=how).to_pandas()
    _match(got, exp)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(lk=_keys, rk=_keys, how=_hows, thresh=st.integers(0, 5))
def test_fuzz_nonproving_mask_keeps_nan_matches(spark, lk, rk, how, thresh):
    """~(k >= t) KEEPS the NaN rows (null-compare-false then invert), so no
    proof may be emitted and the merge must still match pandas NaN==NaN."""
    lpdf = pd.DataFrame(
        {"k": pd.array(lk, dtype="float64"), "v": np.arange(len(lk), dtype="float64")}
    )
    rpdf = pd.DataFrame(
        {"k": pd.array(rk, dtype="float64"), "w": np.arange(len(rk), dtype="float64")}
    )
    exp = lpdf[~(lpdf.k >= thresh)].merge(rpdf, on="k", how=how)
    fl = from_pandas(lpdf, spark=spark)
    fl = fl[~(fl["k"] >= thresh)]
    assert "k" not in fl._nonnull_cols
    got = fl.merge(from_pandas(rpdf, spark=spark), on="k", how=how).to_pandas()
    _match(got, exp)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lk=_keys,
    rk=_keys,
    how=_hows,
    expr=st.sampled_from(
        ["k >= 2", "k == 1 or k == 3", "k in [0.0, 2.0, 4.0]", "0 <= k <= 4"]
    ),
)
def test_fuzz_query_filter_then_merge(spark, lk, rk, how, expr):
    lpdf = pd.DataFrame(
        {"k": pd.array(lk, dtype="float64"), "v": np.arange(len(lk), dtype="float64")}
    )
    rpdf = pd.DataFrame(
        {"k": pd.array(rk, dtype="float64"), "w": np.arange(len(rk), dtype="float64")}
    )
    exp = lpdf.query(expr).merge(rpdf, on="k", how=how)
    fl = from_pandas(lpdf, spark=spark).query(expr)
    assert "k" in fl._nonnull_cols
    got = fl.merge(from_pandas(rpdf, spark=spark), on="k", how=how).to_pandas()
    _match(got, exp)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lk=_keys,
    expr=st.sampled_from(
        ["k != 2", "not (k == 1)", "k not in [1.0, 3.0]", "not (k >= 2 or k < 1)"]
    ),
)
def test_fuzz_query_nan_keeping_exprs_match_pandas(spark, lk, expr):
    """!=, not-in, and not(...) keep NaN rows in pandas — the translated
    predicate must agree row-for-row and emit no proof."""
    lpdf = pd.DataFrame(
        {"k": pd.array(lk, dtype="float64"), "v": np.arange(len(lk), dtype="float64")}
    )
    exp = lpdf.query(expr)
    fl = from_pandas(lpdf, spark=spark).query(expr)
    assert "k" not in fl._nonnull_cols
    _match(fl.to_pandas(), exp)


def test_str_predicate_masks_prove(spark):
    pdf = pd.DataFrame({"s": ["apple", None, "banana", "apricot"], "k": [1.0, 2.0, 3.0, 4.0]})
    df = from_pandas(pdf, spark=spark)
    for mask in [
        df["s"].str.contains("ap"),
        df["s"].str.startswith("a"),
        df["s"].str.endswith("a"),
        df["s"].str.isalpha(),
        df["s"].str.match("a.*"),
        ~df["s"].str.match("a.*"),  # null->null predicate: negation proves too
    ]:
        out = df[mask]
        assert "s" in out._nonnull_cols, mask._col
        assert not out.to_pandas()["s"].isna().any()
    # ~contains (null->false form) proves NOTHING: nulls survive the negation
    neg = df[~df["s"].str.contains("ap")]
    assert "s" not in neg._nonnull_cols


def test_dt_extractor_masks_prove(spark):
    pdf = pd.DataFrame(
        {
            "ts": [pd.Timestamp("2024-01-15"), pd.NaT, pd.Timestamp("2025-06-01")],
            "k": [1.0, 2.0, 3.0],
        }
    )
    df = from_pandas(pdf, spark=spark)
    out = df[df["ts"].dt.year == 2024]
    assert "ts" in out._nonnull_cols
    assert not out.to_pandas()["ts"].isna().any()
    out2 = df[df["ts"].dt.month >= 1]
    assert "ts" in out2._nonnull_cols


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lk=st.lists(st.one_of(st.sampled_from(["a", "b", "ab"]), st.none()), min_size=1, max_size=10),
    rk=st.lists(st.one_of(st.sampled_from(["a", "b", "ab"]), st.none()), min_size=1, max_size=10),
    how=_hows,
)
def test_fuzz_str_mask_filter_then_merge(spark, lk, rk, how):
    """String-predicate mask as the proof producer: str.contains proves the
    key non-null, the merge takes the plain-equality path; pandas matches
    None==None keys in merge, but the filtered side has none left."""
    from hypothesis import assume

    lpdf = pd.DataFrame({"k": lk, "v": np.arange(len(lk), dtype="float64")})
    rpdf = pd.DataFrame({"k": rk, "w": np.arange(len(rk), dtype="float64")})
    try:
        exp = lpdf[lpdf.k.str.contains("a", na=False)].merge(
            rpdf, on="k", how=how
        )
    except ValueError:
        # pandas 2.2.2 itself crashes on outer merges with duplicated left
        # keys and an all-None right key ("Shape of passed values ...") —
        # no reference result exists for the differential, reject the draw
        assume(False)
    fl = from_pandas(lpdf, spark=spark)
    fl = fl[fl["k"].str.contains("a")]
    assert "k" in fl._nonnull_cols
    got = fl.merge(from_pandas(rpdf, spark=spark), on="k", how=how).to_pandas()
    g = got.sort_values(by=sorted(got.columns), kind="mergesort").reset_index(drop=True)
    e = exp.sort_values(by=sorted(exp.columns), kind="mergesort").reset_index(drop=True)
    assert len(g) == len(e)
    for c in ["v", "w"]:
        gv = pd.to_numeric(g[c], errors="coerce")
        ev = pd.to_numeric(e[c], errors="coerce")
        ok = ((gv - ev).abs() < 1e-9) | (gv.isna() & ev.isna())
        assert bool(ok.all()), (g, e)


def test_row_subset_ops_carry_proofs(spark, nulls_pdf):
    """head/tail/sort/dedup/iloc/loc are row subsets or reorders — proofs
    survive them (the merge fast path stays on through a pipeline tail)."""
    df = from_pandas(nulls_pdf, spark=spark)
    flt = df[df["k"] > 0]
    assert "k" in flt.head(2)._nonnull_cols
    assert "k" in flt.tail(2)._nonnull_cols
    assert "k" in flt.sort_values("k")._nonnull_cols
    assert "k" in flt.drop_duplicates(subset=["k"])._nonnull_cols
    assert "k" in flt.drop_duplicates(subset=["k"], keep=False)._nonnull_cols
    assert "k" in flt.nlargest(2, "k")._nonnull_cols
    assert "k" in flt.iloc[0:2]._nonnull_cols
    # loc label filters prove the index column too
    idf = from_pandas(
        pd.DataFrame({"i": [1, None, 3], "v": [1.0, 2.0, 3.0]}), spark=spark
    ).set_index("i")
    assert "i" in idf.loc[1:3]._nonnull_cols
    assert "i" in idf.loc[[1, 3]]._nonnull_cols
    assert "i" in idf.truncate(before=1)._nonnull_cols
    # value-level: no nulls in proven columns
    for out in [flt.head(2), idf.loc[1:3], idf.truncate(before=0)]:
        for c in out._nonnull_cols:
            assert not out.to_pandas().reset_index()[c].isna().any(), c
