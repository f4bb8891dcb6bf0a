"""As-of and interval (range) joins — custom time-series operators Spark lacks
as built-ins and the reference lacks entirely (SURVEY §2.3: equi-joins only).

As-of join strategy (the 100 TB shape): instead of a per-row backward search or
an exploded range join, UNION the two sides with a side tag, hash-partition by
the `by` key, sort by event time within partitions, and propagate the last seen
right-side row forward with a window `last_value(ignorenulls)`. One shuffle on
the key, one partitioned sort — state never exceeds the partition, and there is
no candidate-pair blowup regardless of time-range density. (DuckDB expresses the
same semantics natively with ASOF JOIN, which is the oracle.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from legate_pandas_spark.operators import query
from legate_pandas_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
    tolerance_seconds: float | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    right.on <= left.on within the same `by` group (pandas merge_asof
    semantics), optionally bounded by a tolerance.

    ``tiebreak_cols`` (right-side columns, ascending) totalize the order
    among right rows sharing one (by, on) — the LAST row in that order wins,
    so e.g. ``["click_id"]`` selects max(click_id) among ties WITHOUT a
    pre-aggregation exchange (the window absorbs the reduction; r12). Left
    rows carry NULL in these columns, and NULLS FIRST keeps them ordered
    after every same-timestamp right row via the _side key alone."""
    lcols = left.columns
    tagged_l = left.withColumn("_side", F.lit(1))
    tagged_r = right.select(
        F.col(by),
        F.col(on),
        *[F.col(c) for c in right_value_cols],
    ).withColumn("_side", F.lit(0))
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    # right rows sort before left rows at identical timestamps → "at-or-before"
    order = [F.col(on).asc(), F.col("_side").asc()]
    if tiebreak_cols:
        order += [F.col(c).asc_nulls_first() for c in tiebreak_cols]
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in right_value_cols:
        filled = filled.withColumn(
            c, F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w)
        )
    asof_ts = F.last(
        F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True
    ).over(w)
    filled = filled.withColumn("_asof_ts", asof_ts)
    out = filled.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("_asof_ts").isNotNull()
            & (
                F.col(on).cast("double") - F.col("_asof_ts").cast("double")
                <= tolerance_seconds
            )
        )
        for c in right_value_cols:
            out = out.withColumn(c, F.when(within, F.col(c)))
    return out.select(*lcols, *right_value_cols)


@query(
    "asof_join_last_click",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, event_id AS purchase_id,
               round(value, 2) AS purchase_value
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id, click_ts, max(click_id) AS click_id FROM (
            SELECT user_id, ts AS click_ts, event_id AS click_id FROM events
            WHERE event_type = 'click'
        ) GROUP BY user_id, click_ts
    )
    SELECT p.purchase_id, p.user_id, p.purchase_value, c.click_id AS last_click_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_asof shape: each purchase picks the user's latest click at-or-
    before it. Implemented with the union+forward-fill technique (one shuffle,
    no pair blowup); the DuckDB oracle is a native ASOF JOIN.

    Tie totalization (round-9, 10x-corpus gate finding): the as-of contract
    is underdetermined when several clicks share one (user, timestamp) —
    each engine may surface a different one. The window's tiebreak order
    (click_id ascending, so the LAST tied row wins) selects max(event_id) —
    'latest recorded' — making the query deterministic on ANY corpus. r12:
    this replaced an equivalent groupBy(user, ts).agg(max) pre-reduction,
    whose corpus-scale exchange the window absorbs for free (2→1 Exchange;
    value-identical by the same max-tie rule, oracle-gated)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.round("value", 2).alias("purchase_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        right_value_cols=["click_id"],
        tiebreak_cols=["click_id"],
    )
    return joined.select(
        "purchase_id", "user_id", "purchase_value", F.col("click_id").alias("last_click_id")
    )


@query(
    "interval_join_attribution",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
               round(value, 2) AS purchase_value
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT user_id AS c_user, ts AS click_ts, event_id AS click_id FROM events
        WHERE event_type = 'click'
    )
    SELECT p.user_id, p.purchase_id, c.click_id, p.purchase_value
    FROM purchases p
    JOIN clicks c
      ON p.user_id = c.c_user
     AND c.click_ts <= p.purchase_ts
     AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
    """,
)
def interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: all clicks within the hour preceding each
    purchase, same user. The equi-key (user_id) carries the shuffle; the time
    range is a residual predicate — no unbounded theta-join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.round("value", 2).alias("purchase_value"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (clicks.click_ts >= purchases.purchase_ts - F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "purchase_id", "click_id", "purchase_value")


@query(
    "q2_argmin_per_group",
    oracle="""
    SELECT n.n_name, r.r_name, s.s_suppkey, s.s_name,
           round(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    QUALIFY row_number() OVER (
        PARTITION BY r.r_name ORDER BY s.s_acctbal, s.s_suppkey
    ) = 1
    """,
)
def q2_argmin_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (argmin per group): the lowest-balance supplier per
    region via a deterministic row_number window (tiebreak on key)."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("r_name").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("n_name", "r_name", "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )
