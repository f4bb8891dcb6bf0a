"""Window / cumulative / event-ordered operators (SURVEY §2.6).

The reference implements only skipna cumulative scans (cumsum/cummax/cummin/cumprod)
via a two-phase distributed scan with carry propagation (core/column.py:644-687,
src/reduction/tasks/scan.cc). In Spark the same semantics are a window aggregate
over the ordering key; ranking/lag/sessionization are free extensions.

Scale note: every window here is PARTITIONED (by user_id / order key) — partitioned
windows shuffle-by-key and parallelize; an unpartitioned global window would
single-task at 100 TB and is deliberately avoided (the one global cumsum offered by
the frontend documents this cost).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from legate_pandas_spark.operators import query
from legate_pandas_spark.sources.tables import load_table


@query(
    "cumsum_running_total",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value)  OVER w, 4) AS running_sum,
           round(max(value)  OVER w, 4) AS running_max,
           round(min(value)  OVER w, 4) AS running_min,
           CAST(count(value) OVER w AS BIGINT) AS running_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def cumsum_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cumsum/cummax/cummin per user over event time (reference two-phase scan,
    core/column.py:644-687) — one shuffle on user_id, local sort, single pass."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_sum"),
        F.round(F.max("value").over(w), 4).alias("running_max"),
        F.round(F.min("value").over(w), 4).alias("running_min"),
        F.count("value").over(w).alias("running_n"),
    )


@query(
    "cumprod_log_trick",
    oracle="""
    SELECT event_id, user_id,
           round(sum(ln(1.0 + value * 0.001)) OVER w, 4) AS running_log_prod
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def cumprod_log_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cumprod via exp∘cumsum∘log (positive factors) — the SURVEY §2.6 mapping for
    the reference's PROD scan without a custom UDAF.

    Precision contract (round-9, 10x-corpus gate finding): ln/exp are libm
    functions whose last-ulp results differ between the JVM and DuckDB, so
    the exp'd product diverges PROPORTIONALLY TO ITS MAGNITUDE — no fixed
    rounding width survives corpus growth (445k/1M rows drifted at 6dp on
    the 10x corpus). The scale-free cross-engine contract is the LOG of the
    running product, emitted at 4dp (the log-sum's absolute divergence is
    ~1e-13 over a million-row window — six orders under the quantum at any
    corpus size); consumers exponentiate locally when they need the raw
    product. The facade's pandas-exact cumprod (frontend/scan.py) is
    unaffected — this is the catalog/SQL mapping."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    factor = F.log(F.lit(1.0) + F.col("value") * 0.001)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(factor).over(w), 4).alias("running_log_prod"),
    )


@query(
    "window_rank_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS BIGINT)      AS rn,
           CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS value_rank,
           round(lag(value)  OVER w, 2)             AS prev_value,
           round(lead(value) OVER w, 2)             AS next_value,
           round(value - coalesce(lag(value) OVER w, value), 2) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + lead/lag — absent in the reference (SURVEY §2.6 'absent' row);
    first-class Spark extension surface."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wv = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(wv).cast("long").alias("value_rank"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value")), 2).alias(
            "delta"
        ),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, event_id, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events, round(sum(value), 4) AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative flag sum —
    the batch analog of the streaming session window; tests the event-pipeline
    shape the engine targets (no reference analog; batch-only reference)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = (
        F.when(
            prev_ts.isNull()
            | (F.col("ts").cast("double") - prev_ts.cast("double") > 1800),
            1,
        ).otherwise(0)
    )
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_seq", F.sum("new_session").over(wsum).cast("long"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error,
           round(sum(value) FILTER (WHERE event_type = 'purchase'), 4) AS purchase_value
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style wide aggregation per user (Spark groupBy().pivot() semantics,
    expressed with conditional aggregates for stable column names)."""
    ev = load_table(spark, sf_dir, "events")

    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")

    return ev.groupBy("user_id").agg(
        cnt("click"),
        cnt("view"),
        cnt("purchase"),
        cnt("signup"),
        cnt("error"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 4
        ).alias("purchase_value"),
    )


@query(
    "time_rollup_multigrain",
    oracle="""
    SELECT coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL')  AS day,
           coalesce(strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'), 'ALL') AS hour,
           CAST(grouping(date_trunc('day', ts)) AS INT)  AS g_day,
           CAST(grouping(date_trunc('hour', ts)) AS INT) AS g_hour,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events
    GROUP BY GROUPING SETS (
        (date_trunc('day', ts), date_trunc('hour', ts)),
        (date_trunc('day', ts)),
        ()
    )
    """,
)
def time_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous rollup: hour, day, and grand-total grains in
    ONE pass via GROUPING SETS (the Expand operator replicates rows per grain —
    one scan instead of a union of per-grain aggregations)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__events_rollup__")
    return spark.sql("""
        SELECT coalesce(date_format(date_trunc('day', ts), 'yyyy-MM-dd'), 'ALL')  AS day,
               coalesce(date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss'), 'ALL') AS hour,
               CAST(grouping(date_trunc('day', ts)) AS INT)  AS g_day,
               CAST(grouping(date_trunc('hour', ts)) AS INT) AS g_hour,
               count(*) AS n, round(sum(value), 4) AS total_value
        FROM __events_rollup__
        GROUP BY GROUPING SETS (
            (date_trunc('day', ts), date_trunc('hour', ts)),
            (date_trunc('day', ts)),
            ()
        )
    """)


@query(
    "share_of_total_window",
    oracle="""
    WITH rev AS (
        SELECT n_name, sum(o_totalprice) AS nation_rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT n_name,
           round(nation_rev, 2) AS nation_rev,
           round(100.0 * nation_rev / sum(nation_rev) OVER (), 6) AS pct_of_total
    FROM rev
    """,
)
def share_of_total_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: per-nation revenue share. The grand total is a 1-row
    aggregate broadcast cross-joined back into the grouped view (AQE reuses the
    group-by shuffle → one fact pass) — the engine-wide rule: no full-row
    single-partition exchange anywhere, even over group-cardinality frames."""
    from legate_pandas_spark.sources.tables import load_table as _lt

    orders = _lt(spark, sf_dir, "orders")
    cust = _lt(spark, sf_dir, "customer")
    nation = _lt(spark, sf_dir, "nation")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("nation_rev"))
    )
    total = rev.agg(F.sum("nation_rev").alias("__tot__"))
    return rev.crossJoin(F.broadcast(total)).select(
        "n_name",
        F.round("nation_rev", 2).alias("nation_rev"),
        F.round(100.0 * F.col("nation_rev") / F.col("__tot__"), 6).alias(
            "pct_of_total"
        ),
    )


@query(
    "sliding_window_agg",
    oracle="""
    WITH buckets AS (
        SELECT user_id, value,
               unnest(list_filter(
                   list_transform(range(0, 4),
                       k -> time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE),
                   b -> ts >= b AND ts < b + INTERVAL 1 HOUR)) AS win_start
        FROM events
    )
    SELECT user_id,
           strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM buckets
    GROUP BY user_id, win_start
    """,
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h length, 15 min slide): each event lands in
    4 overlapping windows (Spark's window() emits them natively; the oracle
    reconstructs the same buckets by explicit enumeration)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT event_id, user_id,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
           floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000    AS cume,
           CAST(ntile(4) OVER w AS INT)             AS quartile,
           round(first_value(value) OVER wo, 2)     AS first_val,
           round(last_value(value) OVER wframe, 2)  AS last_val,
           CAST(dense_rank() OVER w AS BIGINT)      AS drank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id),
           wo AS (PARTITION BY user_id ORDER BY ts, event_id),
           wframe AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank/cume_dist/ntile/first/last/
    dense_rank) — all absent in the reference (SURVEY §2.6), free extensions."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wframe = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # deterministic 6dp rounding (round-9, 10x-corpus gate finding): at 1M
    # rows/user the cume grid k/n COINCIDES with the 6dp rounding grid, and
    # the engines' round() disagree on values sitting a hair off-grid —
    # floor(x*1e6+0.5)/1e6 of the identical double is bit-identical
    return ev.select(
        "event_id",
        "user_id",
        (F.floor(F.percent_rank().over(w) * 1000000 + F.lit(0.5)) / 1000000).alias(
            "pct_rank"
        ),
        (F.floor(F.cume_dist().over(w) * 1000000 + F.lit(0.5)) / 1000000).alias(
            "cume"
        ),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.first("value").over(wo), 2).alias("first_val"),
        F.round(F.last("value").over(wframe), 2).alias("last_val"),
        F.dense_rank().over(w).cast("long").alias("drank"),
    )


@query(
    "cube_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           round(sum(l_quantity), 4) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE with grouping() indicators (extension; SURVEY §2.4 absent row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "sum_qty",
            "n",
        )
    )


@query(
    "rolling_1h_range_window",
    oracle="""
    SELECT event_id, user_id,
           floor(CAST(sum(CAST(value AS DECIMAL(20,2))) OVER w AS DOUBLE)
                 / count(value) OVER w * 10000 + 0.5) / 10000
               AS rolling_avg_1h,
           CAST(count(*)  OVER w AS BIGINT) AS rolling_n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_1h_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour average per user: RANGE frame over event-time microseconds
    — the time-based rolling window the reference lacks entirely (SURVEY §2.6
    'absent' row). Partitioned by user → parallel; frame bounds in µs so both
    engines cut identically.

    The average is computed from a DECIMAL(20,2)-exact frame sum (values are
    2dp), divided in doubles, and rounded via floor(x·1e4 + 0.5) — values are
    non-negative, so this is pure IEEE and bit-identical across engines. The
    plain round(avg(value)) form drifted at the 4dp quantum on the round-10
    SKEW corpus: with half the events on ONE user the frame holds enough
    doubles that engine summation order flips the last ulp (the q1 sum_charge
    class, SCALE.md round-9 — invisible on uniform corpora, certain on hot
    keys at 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    sum_dec = F.sum(F.col("value").cast("decimal(20,2)")).over(w)
    n_val = F.count("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        (
            F.floor(sum_dec.cast("double") / n_val * F.lit(10000.0) + F.lit(0.5))
            / F.lit(10000.0)
        ).alias("rolling_avg_1h"),
        F.count(F.lit(1)).over(w).alias("rolling_n_1h"),
    )


@query(
    "tumbling_window_agg",
    oracle="""
    SELECT user_id,
           strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events
    GROUP BY user_id, time_bucket(INTERVAL 1 HOUR, ts)
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation — the batch shape of the
    Structured Streaming windowed agg in legate_pandas_spark.streaming (absent in
    the batch-only reference; SURVEY §2.6 extension row)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


@query(
    "funnel_conversion_stages",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS vt FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS ct
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.vt
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS pt
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.ct
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def funnel_conversion_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → later click → later purchase): the
    product-analytics staple. Each stage is the count of users whose stage
    event strictly follows their previous stage's first event.

    Scale design: three per-user hash aggregates chained by user_id equi-joins
    — every shuffle is on the same user_id key, so AQE/co-partitioning reuses
    the exchange; no window over the raw stream, no self-cross. Stage frames
    shrink monotonically (funnel!), so later joins are smaller."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_view_click"))))
        .crossJoin(
            F.broadcast(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
        )
    )


@query(
    "cohort_retention_matrix",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', f.cohort_day,
                          CAST(date_trunc('day', e.ts) AS DATE)) AS INTEGER) AS day_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, activity counted
    at each day offset — the (cohort × age) retention triangle.

    Scale design: one per-user aggregate for cohort assignment (user-count
    sized, joins back on the same user_id shuffle key), one distinct-count
    aggregate on (cohort, offset) — a tiny result grid. The cohort frame is
    user-dimension sized; at 100 TB of events it is still only |users| rows
    and AQE picks broadcast vs shuffle per stats."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort_day")
    )
    return (
        ev.join(firsts, "user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.to_date(F.date_trunc("day", F.col("ts"))), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_users"))
    )


@query(
    "first_nonnull_running",
    oracle="""
    SELECT event_id, user_id,
           first_value(CASE WHEN event_type <> 'view' THEN value END IGNORE NULLS)
             OVER w AS first_reading,
           last_value(CASE WHEN event_type <> 'view' THEN value END IGNORE NULLS)
             OVER w AS last_reading
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def first_nonnull_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with IGNORE NULLS over a running per-user frame:
    the earliest and latest non-null sensor reading seen so far ('view' events
    carry no reading). Window PARTITIONED by user — parallel per user; no
    arithmetic on the picked values, so cross-engine comparison is exact."""
    ev = load_table(spark, sf_dir, "events")
    masked = F.when(F.col("event_type") != "view", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first(masked, ignorenulls=True).over(w).alias("first_reading"),
        F.last(masked, ignorenulls=True).over(w).alias("last_reading"),
    )


@query(
    "percentile_disc_by_type",
    oracle="""
    SELECT event_type,
           CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS DOUBLE) AS p25,
           CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS DOUBLE) AS p50,
           CAST(percentile_disc(0.9)  WITHIN GROUP (ORDER BY value) AS DOUBLE) AS p90
    FROM events GROUP BY event_type
    """,
)
def percentile_disc_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (percentile_disc WITHIN GROUP) per event type —
    unlike interpolated percentile, the result IS an element of the data, so
    the cross-engine comparison is exact with no rounding. Same per-group-sort
    cost class as percentile_median_stats; approx_percentile is the documented
    100 TB swap-in (test_scale_techniques.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("p25"),
        F.expr("percentile_disc(0.5)  WITHIN GROUP (ORDER BY value)").alias("p50"),
        F.expr("percentile_disc(0.9)  WITHIN GROUP (ORDER BY value)").alias("p90"),
    )


_TZ_ROLLUP = "America/New_York"


@query(
    "events_local_day_rollup",
    oracle=f"""
    SELECT strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE '{_TZ_ROLLUP}',
                    '%Y-%m-%d') AS local_date,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def events_local_day_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-local-calendar-day event rollup in a business timezone: event
    timestamps are stored as UTC instants (the warehouse convention); the
    daily report groups by the LOCAL New York date — the day boundary
    shifts 4/5 hours off UTC and moves with DST, which a naive date_trunc
    on the raw timestamp gets wrong twice a year. Both engines convert
    through the same IANA zone rules (JVM / ICU), and the measure sums in
    integer cents (floor(x·100+0.5), pure IEEE — the at-scale rounding
    discipline), so the row set is value-hash exact.

    100 TB shape: the zone conversion is a pure per-row expression inside
    the scan projection; the rollup is one partial+final hash aggregate on
    (local_date, event_type) — day-grain cardinality, no skew."""
    events = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    local = F.from_utc_timestamp(F.col("ts"), _TZ_ROLLUP)
    return (
        events.select(
            F.date_format(local, "yyyy-MM-dd").alias("local_date"),
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        )
        .groupBy("local_date", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("value_cents"),
        )
    )


@query(
    "scd2_user_type_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER w AS prev_type,
               (row_number() OVER w = 1) AS is_first
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT user_id, event_id, ts AS valid_from, event_type
        FROM ordered
        WHERE is_first OR prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id,
           CAST(row_number() OVER w2 AS BIGINT) AS version,
           event_type,
           valid_from,
           lead(valid_from) OVER w2 AS valid_to,
           (lead(valid_from) OVER w2 IS NULL) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    """,
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build (Kimball dimension modeling):
    collapse each user's event stream into its event_type CHANGE history with
    [valid_from, valid_to) effective ranges, a per-user version number, and an
    is_current flag — the change-data-capture shape that turns an append-only
    event log into a point-in-time joinable dimension table.

    Scale shape: ONE hash exchange on user_id serves all three window passes
    (lag change detection, then lead/row_number over the filtered change
    rows — same partitioning, no reshuffle; plan-pinned in
    test_round9_scd2.py). The change filter runs BEFORE the second window, so
    the versioning pass sees only change rows (bounded by attribute churn,
    not event volume). Total order inside a user is (ts, event_id) — the
    event_id tiebreak makes same-timestamp flips deterministic cross-engine.
    Null-safe change compare: a null event_type is a real dimension state."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    is_first = F.row_number().over(w) == 1
    changes = (
        ev.withColumn("prev_type", prev)
        .withColumn("is_first", is_first)
        .filter(F.col("is_first") | ~F.col("event_type").eqNullSafe(F.col("prev_type")))
        .select("user_id", "event_id", F.col("ts").alias("valid_from"), "event_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    valid_to = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        F.row_number().over(w2).cast("bigint").alias("version"),
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )
