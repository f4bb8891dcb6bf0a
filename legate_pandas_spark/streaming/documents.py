"""Streaming corpus-curation pipeline: the continuous-ingest twin of the batch
curation operators (operators/curation.py, textops.py) — documents arrive as
files, get quality-scored and PII-scrubbed statelessly, and exact-deduped with
watermark-bounded state.

Scale notes: the stateless stage is pure Catalyst projection per micro-batch
(identical plan to batch — whole-stage codegen, no state). The dedup stage
keys state by content digest; with ingest-time watermarking the state store
evicts digests older than the horizon, bounding memory at (arrival rate ×
watermark), the standard streaming-dedup sizing. No reference analog
(batch-only engine)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_EMAIL = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+"


def stream_documents(spark: SparkSession, directory: str) -> DataFrame:
    """File-source stream over a directory of documents parquet files."""
    return spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(directory)


def quality_scrub_stream(docs: DataFrame) -> DataFrame:
    """Stateless curation stage: token/repetition quality signals + email
    scrub, computed per micro-batch with the exact expressions of the batch
    path (streaming/batch parity is testable column-for-column)."""
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda w: w != F.lit(""))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)) * F.lit(1.0) / F.nullif(F.size(toks), F.lit(0)), 4
        ).alias("distinct_ratio"),
        F.md5(F.regexp_replace(F.col("text"), _EMAIL, "<EMAIL>")).alias("scrubbed_md5"),
    )


def corpus_dedup_stream(docs: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on the content digest. State is bounded by an
    ingest-time watermark: a digest is only held long enough to catch
    duplicates within the horizon (dropDuplicatesWithinWatermark), after which
    the state store evicts it — the standard arrival-rate × horizon sizing."""
    keyed = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("digest"),
        F.current_timestamp().alias("ingest_ts"),
    )
    return keyed.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["digest"]
    )
