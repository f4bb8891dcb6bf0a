"""Round-10 skew handling (VERDICT r9 Next #4).

Two layers: (1) AQE's runtime skew-join rewrite must engage on a hot-key
join — the plan audit here pins that the session's AQE config actually
splits a skewed partition (OptimizeSkewedJoin marks the join `skew=true`);
(2) the /tmp/sfskew corpus (tools/make_skew_corpus.py: deterministic Zipf
hot keys — 2/3 of orders on one custkey, 1/2 of lineitems on one partkey,
1/2 of events on one user) is differentially gated by the oracle runs
recorded in SCALE.md round-10 — drift classes that only appear inside one
huge group (accumulation order, tie bands, salted reassembly) would
hash-mismatch there."""

import pyspark.sql.functions as F


def test_aqe_skew_join_rewrite_engages(spark):
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # scale the detector down to fixture size: a partition is "skewed"
        # past 32 KB and 2x the median; split advisory 16 KB
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        # force a sort-merge join (broadcast would bypass the skew rewrite)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        n = 200_000
        left = spark.range(n).select(
            F.when(F.col("id") % 4 < 3, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pl"),
        )
        right = spark.range(2_000).select(
            F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("pr")
        )
        joined = left.join(right, "k")
        # the action must run on THIS DataFrame's queryExecution — a derived
        # agg would finalize its own adaptive plan, leaving joined's unexecuted
        rows = joined.collect()
        # correctness first: 3/4 of left rows hit k=7, the rest k<2000
        want = sum(1 for i in range(n) if (i % 4 < 3 and 7 < 2_000) or (i % 4 == 3 and i < 2_000))
        assert len(rows) == want
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
