"""Per-stage profile of one query at a given core count (round-13 anti-scaler
hunt, VERDICT r12 Next #5).

Runs the query (sf0.001 codegen warm-up first, best-of-N), then dumps every
stage of the best pass from the UI REST API — task count, executor run time,
wall span — so the serial/barrier term is visible instead of guessed.

Usage: SPARK_GRAFT_CPUS=32 python tools/stage_profile_r13.py <query> [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    from legate_pandas_spark import session as S
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.master(f"local[{cpus}]").appName("stage_profile")
    for k, v in S._TUNED_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.ui.enabled", "true")
    builder = builder.config("spark.sql.shuffle.partitions", str(cpus))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    try:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass
    spark.catalog.clearCache()

    best = None
    for i in range(passes):
        spark.catalog.clearCache()
        group = f"prof:{name}:{i}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        if best is None or el < best[0]:
            best = (el, group)
    el, group = best

    ui = sc.uiWebUrl
    app_id = sc.applicationId
    jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs"))
    stage_ids = []
    for j in jobs:
        if j.get("jobGroup") == group:
            stage_ids.extend(j["stageIds"])
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    rows = [s for s in stages if s["stageId"] in set(stage_ids)]
    rows.sort(key=lambda s: s["stageId"])
    tot_run = sum(s["executorRunTime"] for s in rows)
    print(
        json.dumps(
            {
                "query": name,
                "cpus": cpus,
                "wall_best": round(el, 3),
                "n_jobs": sum(1 for j in jobs if j.get("jobGroup") == group),
                "n_stages": len(rows),
                "sum_executorRunTime_ms": tot_run,
            }
        )
    )
    for s in rows:
        span = ""
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t0 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            t1 = datetime.strptime(s["completionTime"], fmt)
            span = f"span={int((t1 - t0).total_seconds() * 1000):>6}ms"
        except Exception:
            pass
        print(
            f"  stage {s['stageId']:>4} tasks {s['numCompleteTasks']:>4} "
            f"run={s['executorRunTime']:>7}ms cpu={s.get('executorCpuTime', 0) // 1000000:>7}ms "
            f"{span} sched={s.get('schedulerDelay', '?')} "
            f"shR={s.get('shuffleReadBytes', 0):>9} shW={s.get('shuffleWriteBytes', 0):>9}  "
            + s["name"].split("\n")[0][:60]
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
