"""Statistical aggregates and semi-structured (JSON) extraction.

All absent from the reference (SURVEY §2.4 'absent' row for approx/percentile
aggs; §2.8 'absent' for map/json functions) — free Spark extension surface, kept
JVM-side: exact interpolated percentiles, correlation/covariance, and JSON path
extraction over the events ``props`` column."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from legate_pandas_spark.operators import query
from legate_pandas_spark.sources.tables import load_table


@query(
    "percentile_median_stats",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 4)                 AS median_qty,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
           round(quantile_cont(l_discount, 0.9), 4)     AS p90_disc,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_median_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median/percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`). Exact percentiles shuffle per group; at 100 TB use
    `approx_percentile` (not oracle-comparable across engines, hence exact here)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", 0.25), 4).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", 0.75), 4).alias("p75_price"),
        F.round(F.percentile("l_discount", 0.9), 4).alias("p90_disc"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "corr_covar_stats",
    oracle="""
    SELECT round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           round(corr(l_discount, l_tax), 6)                 AS corr_disc_tax,
           count(*) AS n
    FROM lineitem
    """,
)
def corr_covar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and sample covariance — single-pass distributed
    moments (partial aggregation of co-moments, one reduce)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.corr("l_discount", "l_tax"), 6).alias("corr_disc_tax"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the semi-structured props column + predicate on
    the extracted value (JVM-side get_json_object; no Python in the loop)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k_value"), "event_type").filter(
        F.col("k_value") > 50
    )


@query(
    "json_schema_inference",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed aggregation over JSON-extracted fields (from_json with an explicit
    schema → struct access; the scalable alternative to per-row parsing)."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    parsed = ev.withColumn("_p", F.from_json("props", schema))
    return parsed.groupBy("event_type").agg(
        F.round(F.avg(F.col("_p.k")), 4).alias("avg_k"),
        F.max(F.col("_p.k")).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )
