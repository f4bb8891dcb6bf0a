"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY §2.6: no watermarks/windows/stateful
streaming) — this module is the streaming extension surface, built on the
canonical patterns: file-source readStream → event-time watermark → windowed /
session-window aggregation → sink; plus ``applyInPandasWithState`` for a custom
stateful operator the built-ins can't express.

Scale notes: every aggregation is keyed (user_id and/or window), so state is
hash-partitioned across executors; watermarks bound state size; ``availableNow``
triggers give batch-like backfill runs over historical directories.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def _events_raw_schema(directory: str):
    """Streaming sources require an explicit schema — sniff the ts physical
    type from ONE parquet footer (driver-side, once at stream setup): the
    events feed has shipped both int64 epoch-nanos and TIMESTAMP(MICROS,
    tz-naive) encodings across generations."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampNTZType

    ts_is_long = True
    files = sorted(glob.glob(os.path.join(directory, "*.parquet")))
    if files:
        t = pq.read_schema(files[0]).field("ts").type
        # timestamp[ns] (parquet logical TIMESTAMP(NANOS)) surfaces as LONG
        # under the nanosAsLong conf stream_events sets — same path as raw
        # int64 epoch-nanos
        ts_is_long = str(t) in ("int64", "timestamp[ns]")
    return (
        StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", LongType() if ts_is_long else TimestampNTZType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("props", StringType()),
            ]
        ),
        ts_is_long,
    )


def stream_events(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream over a directory of events parquet files; normalizes
    the timestamp column exactly like the batch loader (sources/tables.py)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    schema, ts_is_long = _events_raw_schema(directory)
    raw = spark.readStream.schema(schema).parquet(directory)
    if ts_is_long:
        # integer div (see sources/tables.py): float division loses µs
        # precision on epoch-ns magnitudes
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # tz-naive µs timestamps: session is UTC, the cast is exact
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window aggregation with late-data watermark — the
    streaming twin of the batch ``tumbling_window_agg`` catalog query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.window("ts", window).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


def sessionized_event_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (gap-close semantics) — the streaming-native version of
    the batch lag+cumsum sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sess"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
        .select("user_id", "n_events", "session_value")
    )


def windowed_distinct_users(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours", rsd: float = 0.02
) -> DataFrame:
    """Distinct users per event type per tumbling window — the streaming twin
    of the batch ``running_distinct_users``. Exact COUNT(DISTINCT) is illegal
    in streaming (unbounded per-group state); the scale-correct form is the
    mergeable HLL sketch (``approx_count_distinct``), whose state is O(1) per
    group and whose merge is commutative — identical results batch vs stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("win"))
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .select(
            "event_type",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "approx_users",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def stateful_running_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    event count + value total, state carried across micro-batches (the escape
    hatch for operators Spark's built-in aggs can't express)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_FL_STATE_SCHEMA = StructType(
    [
        StructField("first_reading", DoubleType()),
        StructField("last_reading", DoubleType()),
    ]
)
_FL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_reading", DoubleType()),
        StructField("last_reading", DoubleType()),
    ]
)


def stateful_first_last_reading(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch ``first_nonnull_running`` catalog query:
    per-user earliest/latest non-null sensor reading ('view' events carry no
    reading), state carried across micro-batches via applyInPandasWithState.
    Rows are ordered (ts, event_id) within each batch; the running-frame
    semantics match the batch window exactly when batches arrive in event-time
    order (the file-source backfill contract)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        first, last = state.get if state.exists else (None, None)
        frames = [pdf for pdf in pdf_iter]
        if frames:
            batch = pd.concat(frames).sort_values(["ts", "event_id"])
            mask = (batch["event_type"] != "view") & batch["value"].notna()
            vals = batch.loc[mask, "value"]
            if len(vals):
                if first is None or (isinstance(first, float) and first != first):
                    first = float(vals.iloc[0])
                last = float(vals.iloc[-1])
        state.update((first, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "first_reading": [first],
                "last_reading": [last],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_FL_OUTPUT_SCHEMA,
            stateStructType=_FL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def purchase_click_attribution(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream join: attribute each purchase to the same user's clicks in
    the preceding hour. Both sides carry watermarks and the join has an explicit
    event-time range — the two conditions that let Spark bound join state at
    scale (state ∝ watermark window, not stream length)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def run_available_now(stream: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drain all available input (batch-like backfill) into an in-memory table;
    returns the StreamingQuery after completion."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def topk_event_type_leaderboard(events: DataFrame, k: int = 5) -> DataFrame:
    """Streaming-legal global top-k leaderboard: event types ranked by total
    value. Aggregation + orderBy/limit is allowed ONLY in complete output
    mode — the sort runs on the compact RESULT table each trigger, never on
    the stream itself. Per-group rank windows are illegal on streams (the
    batch twin with per-day ranking is ``window_topk_per_day``); global
    top-k with a total-order tiebreak is the streaming-native form."""
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy(F.desc("total_value"), F.asc("event_type"))
        .limit(k)
    )


_SCD2_STATE_SCHEMA = StructType(
    [
        StructField("last_type", StringType()),
        StructField("last_is_null", BooleanType()),
        StructField("version", LongType()),
    ]
)
_SCD2_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("version", LongType()),
        StructField("event_type", StringType()),
        StructField("valid_from", TimestampType()),
    ]
)


def scd2_change_capture_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch ``scd2_user_type_history`` catalog query:
    per-user SCD2 change capture — emit one row per event_type CHANGE with its
    version number and valid_from instant, carrying (last_type, version) state
    across micro-batches via applyInPandasWithState.

    valid_to / is_current are properties of the NEXT change by definition, so
    a streaming SCD2 sink closes the previous version when the next change row
    arrives (standard CDC merge); the stage then emits exactly the batch
    query's (user_id, version, event_type, valid_from) rows PROVIDED
    micro-batches arrive in event-time order (the file-source backfill
    contract, same as stateful_first_last_reading) — ordering is restored
    only WITHIN a batch (sort on ts, event_id); a within-watermark straggler
    landing in a later batch is versioned in arrival order, as any
    single-pass CDC reader would. A null
    event_type is a REAL dimension state (null-safe compare, like the batch
    eqNullSafe) — tracked with an explicit is_null flag because the state
    store cannot distinguish null-string from absent otherwise. Rows are
    ordered (ts, event_id) within each batch; state is one row per user, so
    the store is bounded by the user population, not event volume."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            last_type, last_is_null, version = state.get
            seen = True
        else:
            last_type, last_is_null, version = None, True, 0
            seen = False
        frames = [pdf for pdf in pdf_iter]
        out_v, out_t, out_ts = [], [], []
        if frames:
            batch = pd.concat(frames).sort_values(["ts", "event_id"])
            for t, ts in zip(batch["event_type"], batch["ts"]):
                cur_is_null = pd.isna(t)
                cur = None if cur_is_null else str(t)
                if (
                    not seen
                    or cur_is_null != last_is_null
                    or (not cur_is_null and cur != last_type)
                ):
                    version += 1
                    out_v.append(version)
                    out_t.append(cur)
                    out_ts.append(ts)
                seen = True
                last_type, last_is_null = cur, cur_is_null
        state.update((last_type, bool(last_is_null), version))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_v),
                "version": out_v,
                "event_type": out_t,
                "valid_from": out_ts,
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SCD2_OUTPUT_SCHEMA,
            stateStructType=_SCD2_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_SESS_STATE_SCHEMA = StructType(
    [
        StructField("session_start", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_SESS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def session_close_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Timeout-driven session closing: emit a session row ONLY when it closes
    — either a new event arrives more than ``gap_minutes`` after the last one
    (gap close inside the handler) or the event-time watermark passes the
    session's timeout with no further events at all (GroupStateTimeout.
    EventTimeTimeout fires the handler with an empty batch; without it, a
    user's final session would never flush — the API surface NoTimeout
    stages can't express).

    State: one (session_start, last_ts, n, total) row per user, watermark-
    bounded. Emitting only closed sessions is what a downstream append-mode
    sink (parquet, Kafka) needs; the open session stays in state. Within-
    batch rows are processed in (ts, event_id) order, and gap closes are
    detected between consecutive events in the batch too — one batch may
    emit several sessions per user.

    Contract (same as the other stateful stages): micro-batches arrive in
    event-time order — the file-source backfill shape. Under that contract
    a gap-closed session can never be reopened by a later event, so
    immediate emission is append-safe; a watermark-valid straggler landing
    in a LATER batch would instead need pending-session state and
    watermark-gated emission — that late-data-correct sessionization is the
    built-in ``F.session_window`` (sessionized_event_stats); this stage
    exists to exercise the TIMEOUT API under the backfill contract. A
    monotonic guard (last never moves backward) keeps state sane even if
    the contract is violated: the straggler joins the open session without
    regressing its end."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        def close(start, last, n, total):
            return {
                "user_id": key[0],
                "session_start": start,
                "session_end": last,
                "n_events": n,
                "total_value": round(total, 4),
            }

        closed = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                closed.append(close(start, last, n, total))
            state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in _SESS_OUTPUT_SCHEMA])
            return

        start = last = None
        n, total = 0, 0.0
        if state.exists:
            start, last, n, total = state.get
            # the state store hands back plain datetime objects; normalize to
            # pandas Timestamps so .value / Timedelta arithmetic works on a
            # user whose session spans micro-batches (caught by the
            # straggler regression test — a latent crash for ANY multi-batch
            # user, not just stragglers)
            start, last = pd.Timestamp(start), pd.Timestamp(last)
        frames = [pdf for pdf in pdf_iter]
        if frames:
            batch = pd.concat(frames).sort_values(["ts", "event_id"])
            for ts, val in zip(batch["ts"], batch["value"]):
                if last is not None and (ts - last).value // 1000 > gap_us:
                    closed.append(close(start, last, n, total))
                    start, n, total = ts, 0, 0.0
                if start is None:
                    start = ts
                if last is None or ts > last:  # monotonic: see contract note
                    last = ts
                n += 1
                total += 0.0 if pd.isna(val) else float(val)
        if last is None:
            # No prior state and an empty batch without a timeout: under
            # Spark's current contract the handler is only invoked with data
            # or a timeout, so this is unreachable — but if that contract
            # ever changes, degrade to a no-op instead of crashing the
            # executor on last.value below (ADVICE r9).
            yield pd.DataFrame(closed, columns=[f.name for f in _SESS_OUTPUT_SCHEMA])
            return
        state.update((start, last, n, total))
        # close the open session when the event-time watermark passes its
        # gap; CEIL the micros->millis conversion so the timeout can never
        # fire before the microsecond-precision expiry the in-batch gap
        # check uses
        last_ms = -((-last.value) // 1_000_000)
        state.setTimeoutTimestamp(last_ms + gap_minutes * 60_000)
        yield pd.DataFrame(closed, columns=[f.name for f in _SESS_OUTPUT_SCHEMA])

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SESS_OUTPUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
