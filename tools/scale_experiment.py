"""10× scale experiment: synthesize an sf1-equivalent dataset from sf0.1
(10 copies of each fact table with shifted keys; dims unchanged — the realistic
fact-growth shape) and compare per-query wall time at sf0.1 vs sf1.

Near-linear scaling (ratio ≈ 10× data → ≲10× time on fixed cores) is the
evidence that plans have no super-linear hotspots (cartesians, broadcast
overflows, single-task windows). Writes results as JSON to stdout.

Usage: python tools/scale_experiment.py [out_dir=/tmp/sfscale10]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

# knobs (round-9): SCALE_COPIES picks the growth factor; SCALE_ONLY_TABLES
# (comma list) scales only those tables and passes the rest through at 1x —
# used to build the embeddings-100x corpus where 10x is still fixed-cost
# dominated (the sf0.1 embedding table is ~1 MB of vectors)
COPIES = int(os.environ.get("SCALE_COPIES", "10"))
ONLY_TABLES = {
    t for t in os.environ.get("SCALE_ONLY_TABLES", "").split(",") if t
}
SRC = "/root/testdata/sf0.1"

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_multikey",
    "skew_salted_join",
    "sort_topk_nlargest",
    "groupby_multi_agg",
    "cumsum_running_total",
    "sessionize_events",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "simhash_signatures",
    "ann_multi_query_topk",
    "ann_ivf_topk",
    "text_quality_score",
    "q17_small_quantity_avg",
    "asof_join_last_click",
    "interval_join_attribution",
    "dedup_connected_components",
    "semdedup_cluster_prune",
    "market_basket_pairs",
    "fuzzy_match_levenshtein",
    "label_centroid_distance",
    "event_transition_matrix",
    "running_distinct_users",
    "ntile_quantile_buckets",
    "bloom_prefilter_decontaminate",
    "heavy_hitters_tokens",
    "embedding_quantize_int8",
    # round 5
    "pack_training_sequences",
    "dedup_containment_pairs",
    "pagerank_two_iter",
    "pd_mortgage_e2e_full",
    # round 6
    "pd_mortgage_style_pipeline",
    "dedup_incremental_shard",
    "decontaminate_exact_substring",
    "temperature_mixture_sample",
    "split_token_distribution_shift",
    # round 7
    "percentile_approx_stats",
    "dedup_embedding_cosine_blocked",
    # round 11: span dedup (gram-volume-linear) and the real codec kernels
    "exact_substring_spans",
    "exact_substring_cut",
    "multimodal_jpeg_decode",
    "multimodal_video_decode",
    # round 12: the MJPEG and GIF codec rows (linear Arrow kernels)
    "multimodal_mjpeg_decode",
    "multimodal_gif_decode",
    "pd_global_rank_rolling",
    "ann_pq_topk",
    # round 9: the ANN/embedding family over the JITTERED 10x embeddings
    # (copies >= 1 carry a deterministic per-copy perturbation, so the
    # scaled corpus holds 10x DISTINCT vectors — real ANN data growth,
    # not degenerate exact clones)
    "ann_cosine_topk",
    "ann_lsh_bucket_stats",
    "ann_recall_eval",
    "ann_recall_eval_sampled",
    "pagerank_two_iter",
    "dedup_cosine_blocked_lsh_approx",
    # round 9 (cont.): sub-document dedup + lexical retrieval — the 10x
    # corpus makes every segment a 10-way clone (adversarial clone density)
    # and grows both the BM25 query set and its candidate postings 10x
    "segment_dedup_reassemble",
    "bm25_bench_retrieval",
    "ingest_tag_report",
    "approx_distinct_orders",
    # round 9 (session 2+): LM-quality filter, tz rollup, tokenizer training,
    # CDC dimension build — events grow 10x (scd2 change volume follows),
    # documents grow 10x (bpe word-count pass; the vocab-sized merge side is
    # fixed by construction)
    "perplexity_lm_filter",
    "events_local_day_rollup",
    "bpe_merge_learn",
    "scd2_user_type_history",
    "triangle_count_copurchase",
    "hard_negative_mining",
    "bpe_encode_corpus",
    "label_propagation_communities",
    "jl_projection_distortion",
    "snapshot_diff_cdf",
]

SHIFT_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": [],  # vec_id NOT shifted for copies>0 would break centroid
}


EMB_MARKER = ".embeddings_jittered_v2"


def build(spark, out_dir: str) -> None:
    from legate_pandas_spark.sources.tables import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        path = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(path):
            # per-table skip; embeddings rebuild once for the jitter upgrade
            if name != "embeddings" or os.path.exists(
                os.path.join(out_dir, EMB_MARKER)
            ):
                continue
        df = load_table(spark, SRC, name)
        if name in ("region", "nation", "customer", "supplier", "part") or (
            ONLY_TABLES and name not in ONLY_TABLES
        ):
            df.write.mode("overwrite").parquet(path)
            continue
        keys = SHIFT_KEYS.get(name, [])
        if name == "embeddings":
            # shift vec_id except copy 0 keeps originals (centroids/probes)
            keys = ["vec_id"]
        base = {k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        parts = []
        for i in range(COPIES):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * base[k]))
            if name == "embeddings" and i > 0:
                # deterministic per-copy jitter (round-9): copies >= 1 become
                # DISTINCT vectors (golden-angle phase mixing keyed on copy
                # index, vec_id, and element position) so the 10x corpus
                # grows the ANN search space for real, while copy 0 keeps the
                # exact originals the queries/centroids (vec_id < 8) select.
                # No RNG: rebuildable bit-identically.
                theta = (
                    F.col("vec_id").cast("double") * F.lit(0.7390851332)
                    + F.lit(float(i) * 2.3999632297)
                )
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, j: (
                            x * F.cos(theta + j.cast("double") * F.lit(0.1))
                            + F.sin(theta * (j.cast("double") + F.lit(1.0)))
                            * F.lit(0.3)
                        ).cast("float"),
                    ),
                )
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(path)
        if name == "embeddings":
            with open(os.path.join(out_dir, EMB_MARKER), "w") as fh:
                fh.write("jittered copies 1..9\n")
        print(f"built {name}: x{COPIES}", file=sys.stderr)


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale10"
    subset = sys.argv[2:] or QUERIES  # optional query-name args
    from legate_pandas_spark.operators import QUERIES as CATALOG, load_all
    from legate_pandas_spark.session import get_spark

    load_all()
    spark = get_spark("scale_experiment")
    build(spark, out_dir)  # per-table skip inside

    results = {}
    for name in subset:
        fn = CATALOG[name]
        times = {}
        for label, sf_dir in [("sf0.1", SRC), ("sf1", out_dir)]:
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                el = time.time() - t0
                best = el if best is None or el < best else best
            times[label] = round(best, 3)
        times["ratio"] = round(times["sf1"] / max(times["sf0.1"], 1e-9), 2)
        results[name] = times
        print(f"{name}: {times}", file=sys.stderr)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
