"""Round-12 measurement harness (guide §1: measure first).

For each requested query (default: bench HEADLINE set) at $SPARK_GRAFT_SF_DIR:
  * capture .explain("formatted") to plans/r13/<name>_<tag>.txt
  * time the noop-sink materialization (best of N passes, matching bench.py)
  * count plan nodes (Exchange / Sort / BatchEvalPython / ArrowEvalPython /
    MapInArrow / Generate / SortMergeJoin / BroadcastHashJoin / ...) and the
    number of Spark jobs the materialization launched
  * write one JSON line per query to /tmp/measure_r13_<tag>.jsonl

Usage: python tools/measure_r13.py <tag> [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NODES = [
    "Exchange",
    "Sort ",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "Generate",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "Scan parquet",
    "InMemoryTableScan",
]


def plan_counts(plan: str) -> dict[str, int]:
    out = {}
    for node in NODES:
        # match node names at the operator-id position: "(3) Exchange" or "+- Exchange"
        n = len(re.findall(r"\(\d+\) " + re.escape(node.strip()) + r"\b", plan))
        if n:
            out[node.strip()] = n
    return out


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("MEASURE_PASSES", "3"))

    from legate_pandas_spark.operators import QUERIES, load_all
    from legate_pandas_spark.session import get_spark

    load_all()
    if not names:
        import bench

        names = bench.HEADLINE
    spark = get_spark("measure_r13")
    sc = spark.sparkContext

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    # warm: codegen at sf0.001 + page-cache the target corpus (bench protocol)
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()
    for root, _dirs, files in os.walk(sf_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                try:
                    with open(os.path.join(root, fn), "rb") as f:
                        while f.read(1 << 22):
                            pass
                except OSError:
                    pass

    out_path = f"/tmp/measure_r13_{tag}.jsonl"
    results = []
    with open(out_path, "w") as out:
        for name in names:
            try:
                df = QUERIES[name](spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            except Exception as e:
                rec = {"query": name, "error": str(e)[:300]}
                out.write(json.dumps(rec) + "\n")
                out.flush()
                continue
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as pf:
                pf.write(plan)
            best = None
            jobs_first = None
            for i in range(passes):
                sc.setJobGroup(f"m:{name}:{i}", name)
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                el = time.time() - t0
                ids = sc.statusTracker().getJobIdsForGroup(f"m:{name}:{i}")
                if jobs_first is None:
                    jobs_first = len(ids)
                if best is None or el < best:
                    best = el
            rec = {
                "query": name,
                "sec": round(best, 3),
                "jobs": jobs_first,
                "nodes": plan_counts(plan),
            }
            results.append(rec)
            out.write(json.dumps(rec) + "\n")
            out.flush()
    total = sum(r["sec"] for r in results)
    print(json.dumps({"tag": tag, "total": round(total, 3), "n": len(results)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
