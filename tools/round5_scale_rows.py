"""Round-5 SCALE.md rows: measure the queries touched this round at sf0.1 vs
the synthesized sf1-equivalent (/tmp/sfscale10, built by scale_experiment.py),
plus the parameterized 5-iteration pagerank (not a catalog query).

Usage: python tools/round5_scale_rows.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
BIG = "/tmp/sfscale10"

CATALOG_QUERIES = [
    "pack_training_sequences",
    "dedup_containment_pairs",
    "pagerank_two_iter",
    "pd_mortgage_e2e_full",
    "q15_top_supplier",
    "q11_important_stock",
    "share_of_total_window",
]


def main() -> int:
    from legate_pandas_spark.operators import QUERIES as CATALOG, load_all
    from legate_pandas_spark.operators.analytics import (
        _trade_graph_edges,
        pagerank,
    )
    from legate_pandas_spark.session import get_spark

    load_all()
    spark = get_spark("round5_scale")
    results = {}
    for name in CATALOG_QUERIES:
        fn = CATALOG[name]
        times = {}
        for label, sf_dir in [("sf0.1", SRC), ("sf1", BIG)]:
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                el = time.time() - t0
                best = el if best is None or el < best else best
                spark.catalog.clearCache()
            times[label] = round(best, 3)
        times["ratio"] = round(times["sf1"] / max(times["sf0.1"], 1e-9), 2)
        results[name] = times
        print(f"{name}: {times}", file=sys.stderr)

    # 5-iteration pagerank via the parameterized primitive
    times = {}
    for label, sf_dir in [("sf0.1", SRC), ("sf1", BIG)]:
        best = None
        for _ in range(2):
            t0 = time.time()
            rank = pagerank(_trade_graph_edges(spark, sf_dir), iterations=5)
            rank.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None or el < best else best
            spark.catalog.clearCache()
        times[label] = round(best, 3)
    times["ratio"] = round(times["sf1"] / max(times["sf0.1"], 1e-9), 2)
    results["pagerank_five_iter"] = times
    print(f"pagerank_five_iter: {times}", file=sys.stderr)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
