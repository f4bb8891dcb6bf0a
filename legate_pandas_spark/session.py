"""SparkSession bootstrap tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same config
block is what we would ship as ``spark-defaults`` on a real cluster:

* AQE on (runtime re-plan, partition coalescing, skew-join splitting) — replaces the
  reference's weighted-partition rebalancing (core/runtime.py:1001-1008).
* Arrow on for any pandas interchange (Pandas UDFs, toPandas).
* Shuffle partitions sized for the local core count; on a 1000-executor cluster this
  would be ~2-3x total cores, and AQE coalesces down.
* ``nanosAsLong`` so parquet TIMESTAMP(NANOS) columns (events.ts) are readable;
  sources.tables converts them to microsecond timestamps (documented ns→µs
  truncation, SURVEY §1.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_TUNED_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Round-12 (guide §3.1/§9): allow shuffled-hash joins. Sort-merge pays a
    # per-side sort the hash join skips; SHJ is picked statically when the
    # planner's size conditions hold, and AQE additionally rewrites SMJ→SHJ
    # at runtime when every post-shuffle partition is under the local-map
    # threshold (sized = advisory partition size, the guide's pairing), so
    # partitions that outgrow the threshold at cluster scale keep the
    # sort-merge spill path. Overridable via env for A/B.
    "spark.sql.join.preferSortMergeJoin": os.environ.get(
        "SPARK_GRAFT_PREFER_SMJ", "false"
    ),
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": os.environ.get(
        "SPARK_GRAFT_SHJ_LOCALMAP", "64m"
    ),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # let a join reuse children already hash-partitioned on a SUBSET of its
    # keys (e.g. the mortgage combine merge on (loan, year, month) over two
    # frames both hash(loan)) instead of re-exchanging both sides — the
    # Catalyst analog of the reference's tracked `_partition_keys` reuse
    # (reference core/table.py:222-268, core/merge.py:296-354)
    "spark.sql.requireAllClusterKeysForCoPartition": "false",
    # timestamps in the testdata are naive wall times stored as UTC-epoch
    # nanos; rendering/extraction must not shift with the host timezone
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "16g",
    # The oracle gate collects FULL pair-granular results for the
    # differential compare — 51M rows (~1.5 GB Arrow) at the 100×-docs
    # corpus (round-11: the clone-collapsed oracles made that compare
    # feasible; the default 1g cap was the last blocker). Production paths
    # never collect unbounded results (VERDICT-audited every round), so the
    # cap is not load-bearing there.
    "spark.driver.maxResultSize": "8g",
}


def get_spark(app_name: str = "legate_pandas_spark", cpus: int | None = None) -> SparkSession:
    """Create (or reuse) a tuned local SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    for k, v in _TUNED_CONF.items():
        builder = builder.config(k, v)
    # scale-adaptive, not a local[32] constant (guide §2.2): one shuffle
    # partition per core (AQE coalesces below that when stages are tiny); on
    # a cluster this should be 2-3x total cores — override via
    # SPARK_GRAFT_SHUFFLE_PARTITIONS. Resolved HERE from the same ``cpus``
    # that sizes the master string (ADVICE r12: an explicit get_spark(cpus=N)
    # caller gets N partitions, not the env default), env override winning.
    # At the default 32-core bench this resolves to the same 32 the driver
    # has always measured.
    builder = builder.config(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus)),
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_runtime_conf(spark: SparkSession) -> None:
    """Best-effort apply runtime-settable confs to an externally created session
    (the correctness driver passes its own SparkSession to ``queries()``)."""
    settings = {
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # local[k] test scale: 200 default shuffle partitions is pure
        # overhead; one per core, env-overridable (see _TUNED_CONF)
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS",
            os.environ.get("SPARK_GRAFT_CPUS", "32"),
        ),
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.sql.join.preferSortMergeJoin": os.environ.get(
            "SPARK_GRAFT_PREFER_SMJ", "false"
        ),
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": os.environ.get(
            "SPARK_GRAFT_SHJ_LOCALMAP", "64m"
        ),
        "spark.sql.requireAllClusterKeysForCoPartition": "false",
        "spark.sql.session.timeZone": "UTC",
    }
    for k, v in settings.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — sources.tables has a fallback
