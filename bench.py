"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is fully materialized via the noop sink (no driver collect overhead,
no result truncation) — measures the whole pipeline including shuffles.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q17_small_quantity_avg",
    "q19_disjunctive_predicates",
    "nation_pair_volume",
    "having_big_orders",
    "join_broadcast_dims",
    "join_multikey",
    "skew_salted_join",
    "sort_topk_nlargest",
    "groupby_multi_agg",
    "percentile_median_stats",
    "cumsum_running_total",
    "sessionize_events",
    "window_rank_lag_lead",
    "rolling_1h_range_window",
    "json_schema_inference",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "simhash_signatures",
    "ann_cosine_topk",
    "ann_multi_query_topk",
    "ann_ivf_topk",
    "text_quality_score",
    "token_count_bpe",
    "pd_mortgage_style_pipeline",
    "pd_mortgage_e2e_full",
    "asof_join_last_click",
    "interval_join_attribution",
    "window_distribution_funcs",
    "cube_grouping_sets",
    "text_normalize_pipeline",
    "q13_customer_order_distribution",
    "doc_chunking_sliding",
    "pack_training_sequences",
    "grouped_map_zscore",
    "dedup_connected_components",
    # round 2: corpus-curation + encode additions
    "repeated_ngram_spans",
    "unigram_logprob_quality",
    "tfidf_top_terms",
    "semdedup_cluster_prune",
    "mixture_weighted_sample",
    # round 2: analytics catalog
    "fuzzy_match_levenshtein",
    "date_spine_gap_fill",
    "locf_gap_fill",
    "market_basket_pairs",
    "running_distinct_users",
    "ntile_quantile_buckets",
    "regexp_extract_numbers",
    "grouped_mode_event",
    "event_transition_matrix",
    "mad_robust_stats",
    "label_centroid_distance",
    "multimodal_feature_extract",
    "q18_large_volume_customers",
    "window_topk_per_day",
    "ngram_top_bigrams",
    "dedup_embedding_cosine_blocked",
    "kmeans_two_rounds",
    # round 3: window-twin additions
    "first_nonnull_running",
    "percentile_disc_by_type",
    # round 4: distributed rank + rolling facade pin, training-split ops
    "pd_global_rank_rolling",
    "pd_rolling_median_quantile",
    "train_val_test_split",
    "cross_split_leakage",
    # round 4 (cont.): sketch-shaped scale paths
    "bloom_prefilter_decontaminate",
    "heavy_hitters_tokens",
    "embedding_quantize_int8",
    "pagerank_two_iter",
    "merge_micro_padded_strings",
    "sort_micro_checksum",
    # round 7: sketch percentile production path + PQ ANN
    "percentile_approx_stats",
    "ann_pq_topk",
    "gopher_quality_rules",
    # round 6: incremental ingest loop + exact-substring decontamination
    "dedup_incremental_shard",
    "decontaminate_exact_substring",
    "boilerplate_ngram_ratio",
    "temperature_mixture_sample",
    "split_token_distribution_shift",
    # round 8: DSIR data selection + ANN recall evaluation
    "dsir_importance_resample",
    "ann_recall_eval",
    # round 9: sampled-GT recall (production form) + composed DSIR funnel
    # + the multi-table LSH scale path for blocked cosine dedup
    "ann_recall_eval_sampled",
    "dsir_gopher_dedup_funnel",
    "dedup_cosine_blocked_lsh_approx",
    # round 9 (cont.): sub-document dedup + lexical retrieval + the
    # composed ingest tagging pass (streaming stage code, batch-graded)
    "segment_dedup_reassemble",
    "bm25_bench_retrieval",
    "ingest_tag_report",
    "approx_distinct_orders",
    # round 9 (cont. 2): CCNet-style hashed-bigram LM quality filter
    # + the timezone-aware local-day rollup
    "perplexity_lm_filter",
    "events_local_day_rollup",
    "bpe_merge_learn",
    "scd2_user_type_history",
    "triangle_count_copurchase",
    "hard_negative_mining",
    "bpe_encode_corpus",
    "countmin_token_freq",
    "label_propagation_communities",
    "jl_projection_distortion",
    "snapshot_diff_cdf",
    # round 10: real BMP encode->parse roundtrip (the decode kernel is real
    # now); bpe_encode_k16 stays OUT of the headline set deliberately — its
    # cost is k x fixed job cadence (~1s/round), a scheduling artifact that
    # would dominate the wall column without measuring data-path work
    "multimodal_image_decode",
    "multimodal_audio_decode",
    "multimodal_jpeg_decode",
    "multimodal_video_decode",
    "multimodal_mjpeg_decode",
    "multimodal_gif_decode",
    "exact_substring_spans",
    "exact_substring_cut",
]


def _other_spark_jvms() -> list[str]:
    """Other live Spark JVMs on this box (concurrent pytest/oracle runs
    invalidated the round-6 bench artifact — ROUND_NOTES gotcha #3)."""
    import subprocess

    try:
        out = subprocess.run(
            ["pgrep", "-af", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True, text=True, timeout=10,
        ).stdout
    except Exception:
        return []
    me = str(os.getpid())
    procs = []
    for line in out.strip().splitlines():
        pid = line.split()[0]
        if pid == me:
            continue
        # skip our own child JVM (it has our pid as its parent)
        try:
            with open(f"/proc/{pid}/stat") as f:
                ppid = f.read().split()[3]
            if ppid == me:
                continue
        except OSError:
            continue
        procs.append(line[:120])
    return procs


def main() -> int:
    others = _other_spark_jvms()
    if others and not os.environ.get("SPARK_GRAFT_BENCH_FORCE"):
        print(
            "bench: refusing to run — other Spark JVMs are live (timings would "
            "be load-contaminated). Set SPARK_GRAFT_BENCH_FORCE=1 to override.\n"
            + "\n".join(others),
            file=sys.stderr,
        )
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from legate_pandas_spark.operators import QUERIES, load_all
    from legate_pandas_spark.session import get_spark

    load_all()
    spark = get_spark("bench")

    # Warm-up: run each headline query once at the smallest SF so whole-stage
    # codegen/JIT compilation is not billed to the timed pass (standard steady-
    # state benchmarking; the compiled plans are reused at the target SF).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            try:
                QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass
        spark.catalog.clearCache()

    # Input warm-up (round-11, VERDICT r10 Next #5): the r10 close artifact
    # read 12% high because the OS page cache had been flushed — the sf0.001
    # codegen warm-up above never touches the TARGET corpus's bytes. One
    # sequential read of every input parquet file brings them into the page
    # cache untimed, so consecutive bench runs land within the ±10% band
    # regardless of what ran before. (~100 MB at sf0.1 — negligible.)
    warmed_bytes = 0
    for root, _dirs, files in os.walk(sf_dir):
        for fn in files:
            if fn.endswith(".parquet") or fn.endswith(".crc"):
                try:
                    with open(os.path.join(root, fn), "rb") as f:
                        while chunk := f.read(1 << 22):
                            warmed_bytes += len(chunk)
                except OSError:
                    pass

    def _meminfo() -> dict:
        # machine-state token recorded in the artifact: a reviewer can tell a
        # cold-cache run from a warm one instead of guessing from the totals
        out = {}
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    k, v = line.split(":", 1)
                    if k in ("MemAvailable", "Cached"):
                        out[k.lower() + "_mb"] = int(v.split()[0]) // 1024
        except OSError:
            pass
        return out

    # host token (ADVICE r12): cross-host totals are not comparable on these
    # shared VMs — record where the artifact was measured so a reviewer can
    # tell a host change from a code change.
    import platform

    cpu_model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    cpu_model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    machine_state = {
        "input_bytes_warmed": warmed_bytes,
        "host": platform.node(),
        "cpu_model": cpu_model,
        **_meminfo(),
    }

    # Three timed passes over the whole set, each in a different (seeded,
    # reproducible) order, per-query best-of-3: interleaving passes decorrelates
    # a query's samples from whatever GC/compaction happened to precede it, so
    # cross-round deltas on untouched queries reflect code, not slot noise.
    import random

    samples: dict[str, list[float]] = {n: [] for n in HEADLINE}
    for i in range(3):
        order = HEADLINE[:]
        random.Random(1000 + i).shuffle(order)
        for name in order:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)
    # `queries` stays per-query best-of-3 (unchanged methodology since r11 —
    # round-over-round comparable); `queries_median` is an ADDITIVE key
    # (VERDICT r12 Next #1): the median resists one-sided load spikes, and
    # the best/median gap per query is a published noise band for the run.
    timings = {n: round(min(s), 3) for n, s in samples.items() if s}
    medians = {n: round(sorted(s)[len(s) // 2], 3) for n, s in samples.items() if s}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_query_wall_time_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "value_median": round(sum(medians.values()), 3),
        "n_passes": 3,
        # headline set GROWS per round — compare per-query times across rounds,
        # not totals (r1: 40 queries, r2: 59)
        "n_queries": len(timings),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "machine_state": machine_state,
    }
    line = json.dumps(result)
    print(line)
    # Also persist to a file: the driver captures a truncated output tail, so
    # BENCH_r*.json "parsed" came back null when the one-line JSON got cut.
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_results.json"
    )
    try:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass  # the printed line remains the contract
    return 0


if __name__ == "__main__":
    sys.exit(main())
