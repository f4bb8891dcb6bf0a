"""Scale-technique verification: bucketed co-located joins (shuffle elimination),
approximate aggregates (error-bounded), AQE behavior — the §4 optimizer story."""

import pyspark.sql.functions as F
import pytest


def plan_text(df, mode: str = "formatted") -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(em)


def test_bucketed_join_eliminates_shuffle(spark, sf_dir):
    """Pre-bucketing both join sides on the key removes the per-query Exchange —
    the Spark analog of the reference's tracked partition keys
    (reference core/table.py:222-268, reuse check core/merge.py:296-354)."""
    from legate_pandas_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bkt_orders"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("bkt_lineitem"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("bkt_orders")
        b = spark.table("bkt_lineitem")
        j = a.join(b, a.o_orderkey == b.l_orderkey).groupBy("o_orderstatus").count()
        plan = plan_text(j, mode="simple")
        assert "SortMergeJoin" in plan
        # co-located buckets: no shuffle exchange feeding the join
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # correctness unchanged
        got = {r["o_orderstatus"]: r["count"] for r in j.collect()}
        want = {
            r["o_orderstatus"]: r["count"]
            for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderstatus")
            .count()
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """HLL++ approx distinct within its rsd bound vs the exact count — the
    100 TB path for nunique (exact countDistinct is oracle-checked instead)."""
    from legate_pandas_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06


def test_approx_percentile_close_to_exact(spark, sf_dir):
    from legate_pandas_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
        F.percentile("l_extendedprice", 0.5).alias("exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    """AQE replaces the reference's weighted-partition rebalancing
    (core/runtime.py:1001-1008): tiny shuffle outputs coalesce below the static
    32-partition setting."""
    from legate_pandas_spark.sources.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    out = nation.groupBy("n_regionkey").count()
    out.collect()
    n_parts = out.rdd.getNumPartitions()
    assert n_parts < 32, f"AQE did not coalesce: {n_parts} partitions"


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The salted-join catalog query must not funnel the hot key through one
    task: its pre-agg join keys include the salt."""
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    plan = plan_text(QUERIES["skew_salted_join"](spark, sf_dir), mode="simple")
    assert "salt" in plan  # join key includes the salt column


def test_lsh_recall_vs_bruteforce(spark, sf_dir, duck):
    """LSH near-dup recall: with b=4 bands of r=2, a pair at jaccard>=0.8 is
    caught with prob 1-(1-j^2)^4 >= 98%; assert >=90% recall of the brute-force
    ground truth (and 100% precision — every emitted pair is verified exact)."""
    from legate_pandas_spark.operators import QUERIES, load_all

    load_all()
    got = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    truth = duck.execute("""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
        sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, greatest(len(toks)-1, 1)),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
                FROM t WHERE len(toks) >= 3),
        pairs AS (
            SELECT a.doc_id ia, b.doc_id ib, count(*) inter
            FROM sh0 a JOIN sh0 b USING (s) WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2),
        sizes AS (SELECT doc_id, count(*) n FROM sh0 GROUP BY 1)
        SELECT ia, ib FROM pairs
        JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
    """).fetchall()
    truth = {(int(a), int(b)) for a, b in truth}
    assert got <= truth  # 100% precision (exact verification stage)
    if truth:
        recall = len(got & truth) / len(truth)
        assert recall >= 0.9, f"LSH recall {recall:.2f} below bound"


def test_partition_pruning_on_hive_layout(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout (the 100 TB organization: facts
    partitioned by date/tenant) must prune at planning time: a filter on the
    partition column reads ONLY matching directories. The reference has no
    analog (its partitioning is positional); this is Spark's replacement for
    the 'which pieces do I touch' decision."""
    import pyspark.sql.functions as F

    from legate_pandas_spark.sources.tables import load_table

    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    one_type = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = plan_text(one_type)
    # planning-time pruning: the partition filter appears as PartitionFilters,
    # never as a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1].splitlines()[0]
    got = one_type.count()
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert got == want


def test_partitioned_write_facade(spark, sf_dir, tmp_path):
    """Facade to_parquet(partition_cols=...) produces the prunable layout."""
    import os

    import legate_pandas_spark as lps

    ldf = lps.read_parquet(os.path.join(sf_dir, "orders.parquet"), spark=spark)
    out = str(tmp_path / "orders_by_status")
    ldf.to_parquet(out, partition_cols=["o_orderstatus"])
    dirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    assert {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"} <= dirs
    back = lps.read_parquet(out, spark=spark)
    assert len(back) == len(ldf)
