"""Plan-regression budgets for the most expensive bench queries (round-12,
VERDICT r11 Next #6).

test_plans.py pins individual plan *shapes* (pushdown, broadcast, no
SinglePartition); this file pins plan *cost counts* — physical Exchange /
Sort / Generate / Python-eval / join node counts for the ~20 most expensive
bench rows — so a Catalyst upgrade or a code change that silently
re-introduces an extra shuffle (or another inner-generator re-evaluation like
the one exact_substring_spans shipped with for a day in round 11,
SCALE.md "ExactSubstr plan fix": 6.1s -> 1.1s) fails in pytest, not in a
wall-time eyeball three rounds later.

Budgets were measured on the current plans at BOTH sf0.001 and sf0.01
(max taken per metric — pd_mortgage_e2e_full legitimately switches four
joins from broadcast to shuffle as the fact side grows past the broadcast
threshold; everything else is SF-invariant). The counter counts nodes in
`explain("formatted")` text, where each physical node appears twice (tree
line + numbered detail header) — budgets are in those doubled units, and the
SAME function records and checks, so the doubling cancels. A failure means:
re-run the measurement, justify the delta in SCALE.md (data growth, Spark
upgrade), and only then raise the budget.
"""

import re

import pytest


def plan_cost_counts(df) -> dict:
    """Count cost-bearing physical nodes in the formatted explain text.

    ReusedExchange is subtracted from the exchange count: a reused exchange
    is the *good* outcome (one shuffle feeding two consumers) and must not
    count as two shuffles.
    """
    jdf = df._jdf
    em = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = jdf.queryExecution().explainString(em)
    return {
        "exchange": len(re.findall(r"\bExchange\b", plan))
        - len(re.findall(r"ReusedExchange", plan)),
        "sort": len(re.findall(r"\bSort \(", plan))
        + len(re.findall(r"\(\d+\) Sort\b", plan)),
        "generate": len(re.findall(r"Generate\b", plan)),
        "python": len(
            re.findall(
                r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|BatchEvalPython",
                plan,
            )
        ),
        "join": len(re.findall(r"Join\b", plan)),
    }


# query -> {metric: budget} — measured 2026-08-16 (round 12) on Spark 4.1.2,
# max over sf0.001 and sf0.01. Exceeding any budget is a plan regression.
BUDGETS = {
    "grouped_map_zscore": {"exchange": 2, "sort": 2, "generate": 0, "python": 2, "join": 0},
    "ingest_tag_report": {"exchange": 12, "sort": 8, "generate": 4, "python": 0, "join": 8},
    "pd_mortgage_e2e_full": {"exchange": 23, "sort": 19, "generate": 0, "python": 0, "join": 32},
    "bm25_bench_retrieval": {"exchange": 22, "sort": 4, "generate": 8, "python": 0, "join": 20},
    # python 0 -> 5: deliberate r12 Arrow vector kernels (signatures + norms +
    # pair dots; interleaved A/B 0.50x — OPTIMIZATION_r12.md "Arrow kernels")
    "dedup_cosine_blocked_lsh_approx": {"exchange": 6, "sort": 8, "generate": 4, "python": 5, "join": 4},
    # r12 session 3: node spine + count derive from the degree aggregate
    # (exchange 45->42, join 53->50 in doubled units)
    "pagerank_two_iter": {"exchange": 42, "sort": 8, "generate": 0, "python": 0, "join": 50},
    # r12: self-join -> collect_set basket + in-plan pair explode (exchange
    # 6->4, join 4->0, generate 0->2 — OPTIMIZATION_r12.md "market_basket")
    "market_basket_pairs": {"exchange": 4, "sort": 0, "generate": 2, "python": 0, "join": 0},
    "boilerplate_ngram_ratio": {"exchange": 6, "sort": 0, "generate": 4, "python": 0, "join": 8},
    # r12 session 3: one-pass bucket model + aggregate-before-spine-join
    # (generate 5->4, join 20->16 in doubled units)
    "dsir_gopher_dedup_funnel": {"exchange": 19, "sort": 4, "generate": 4, "python": 0, "join": 16},
    "sort_micro_checksum": {"exchange": 4, "sort": 2, "generate": 0, "python": 0, "join": 4},
    "label_propagation_communities": {"exchange": 66, "sort": 36, "generate": 0, "python": 0, "join": 74},
    "exact_substring_spans": {"exchange": 6, "sort": 2, "generate": 4, "python": 0, "join": 4},
    "exact_substring_cut": {"exchange": 8, "sort": 0, "generate": 8, "python": 0, "join": 8},
    "join_multikey": {"exchange": 2, "sort": 0, "generate": 0, "python": 0, "join": 4},
    "pd_rolling_median_quantile": {"exchange": 18, "sort": 6, "generate": 0, "python": 0, "join": 24},
    "pd_global_rank_rolling": {"exchange": 18, "sort": 6, "generate": 0, "python": 0, "join": 24},
    # python 0 -> 7: deliberate r12 Arrow kernels (projection + both squared
    # distances; interleaved A/B 0.47x — OPTIMIZATION_r12.md "Arrow kernels")
    "jl_projection_distortion": {"exchange": 2, "sort": 0, "generate": 0, "python": 7, "join": 4},
    "bloom_prefilter_decontaminate": {"exchange": 6, "sort": 0, "generate": 4, "python": 4, "join": 4},
    "ann_recall_eval": {"exchange": 13, "sort": 21, "generate": 2, "python": 0, "join": 25},
    "ann_recall_eval_sampled": {"exchange": 13, "sort": 21, "generate": 2, "python": 0, "join": 25},
    "dedup_incremental_shard": {"exchange": 24, "sort": 40, "generate": 19, "python": 0, "join": 20},
    "percentile_approx_stats": {"exchange": 4, "sort": 0, "generate": 0, "python": 0, "join": 4},
}


@pytest.fixture(scope="module")
def catalog():
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    return QUERIES


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_plan_within_budget(catalog, spark, sf_dir, name):
    # Budgets pin the COLD plan. Session cache state left by earlier tests
    # (module-level persisted memos — semdedup assignments, ingest stores)
    # can substitute InMemoryRelations into subtrees here, shifting size
    # estimates and flipping broadcast<->SMJ, which moves the counts both
    # ways. Clear it so the measurement is deterministic regardless of suite
    # order (memoized stores re-persist themselves on next access).
    spark.catalog.clearCache()
    got = plan_cost_counts(catalog[name](spark, sf_dir))
    budget = BUDGETS[name]
    over = {
        m: (got[m], budget[m]) for m in budget if got[m] > budget[m]
    }
    assert not over, (
        f"{name}: plan regression — {over} (got, budget). An extra Exchange/"
        f"Sort/Generate landed in the physical plan; see test_plan_budgets.py "
        f"docstring before raising the budget."
    )


def test_budget_counter_detects_injected_regression(catalog, spark, sf_dir):
    """Self-check: an artificially injected extra shuffle must trip the
    counter (guards against the regexes rotting under a Spark upgrade)."""
    df = catalog["join_multikey"](spark, sf_dir)
    base = plan_cost_counts(df)
    worse = plan_cost_counts(df.repartition(64, "l_orderkey"))
    assert worse["exchange"] > base["exchange"]
    sortier = plan_cost_counts(df.sortWithinPartitions("l_orderkey"))
    assert sortier["sort"] > base["sort"]
