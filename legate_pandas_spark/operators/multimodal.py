"""Multimodal (binary) column plumbing.

The engine treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` pipelines. The testdata
ships no media files and this container has no codec libraries, so the *decode*
step is a deterministic fake (documented stub) — but the Spark-side plumbing is
real: binary encode, schema declaration, Arrow batch transfer, per-batch pandas
processing, and post-extract relational ops all execute the true production path.

A real deployment swaps ``_fake_decode`` for PIL/ffmpeg calls; nothing else
changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from legate_pandas_spark.operators import query
from legate_pandas_spark.sources.tables import load_table

EXTRACT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("checksum", StringType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("modality", StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB decode — deterministic stand-in for an image decoder.

    Real implementation would be e.g. ``PIL.Image.open(io.BytesIO(payload)).size``;
    codec libraries are not available in this environment, so dimensions are
    derived deterministically from the payload length (mirrors the SQL oracle).
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def decode_binary_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over a (doc_id, payload binary) frame."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = payloads.map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "fake_width": dims.map(lambda d: d[0]).astype("int32"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int32"),
                    "modality": ["image"] * len(pdf),
                }
            )

    return df.mapInPandas(extract, EXTRACT_SCHEMA)


@query(
    "multimodal_decode_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)      AS byte_len,
           md5(text)                                        AS checksum,
           CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS fake_height,
           'image'                                          AS modality
    FROM documents
    """,
)
def multimodal_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text → binary payload → mapInPandas metadata
    extraction (Arrow batches; decode stubbed deterministically). The DuckDB
    oracle mirrors the deterministic fake, so the full Python plumbing is
    hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return decode_binary_metadata(payloads)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("dst_width", IntegerType()),
        StructField("dst_height", IntegerType()),
    ]
)


@query(
    "multimodal_resize_plan",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS src_width,
             CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS src_height
      FROM documents
    )
    SELECT doc_id, src_width, src_height,
           CAST(CASE WHEN src_width >= src_height
                THEN 256
                ELSE (src_width * 256) // src_height END AS INT) AS dst_width,
           CAST(CASE WHEN src_width >= src_height
                THEN (src_height * 256) // src_width
                ELSE 256 END AS INT) AS dst_height
    FROM dims
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize stage (long side → 256): decode dims via the
    stubbed mapInPandas decoder, then the target-geometry computation — integer
    arithmetic that would parameterize the real PIL/ffmpeg resize call. The
    geometry math runs JVM-side AFTER the Arrow hop, so only the decode pays
    the Python boundary."""

    def resize(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            dims = payloads.map(_fake_decode)
            w = dims.map(lambda d: d[0]).astype("int32")
            h = dims.map(lambda d: d[1]).astype("int32")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "src_width": w, "src_height": h}
            )

    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    dims_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("src_width", IntegerType()),
            StructField("src_height", IntegerType()),
        ]
    )
    dims = payloads.mapInPandas(resize, dims_schema)
    long_side = F.col("src_width") >= F.col("src_height")
    return dims.select(
        "doc_id",
        "src_width",
        "src_height",
        F.when(long_side, F.lit(256))
        .otherwise(F.floor(F.col("src_width") * 256 / F.col("src_height")))
        .cast("int")
        .alias("dst_width"),
        F.when(long_side, F.floor(F.col("src_height") * 256 / F.col("src_width")))
        .otherwise(F.lit(256))
        .cast("int")
        .alias("dst_height"),
    )


@query(
    "multimodal_feature_extract",
    oracle="""
    WITH bytes AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             length(text) - length(replace(text, ' ', '')) AS spaces,
             text
      FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS byte_len,
           CAST(spaces AS DOUBLE) / n AS space_ratio,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
    FROM bytes
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload feature extraction in an Arrow-batched mapInPandas stage
    (the feature-extract slot of the decode/extract/resize/frame-sample
    pipeline): byte length, payload byte-histogram feature (space-byte ratio —
    a stand-in for e.g. an embedding head), and the leading byte. Features are
    deterministic byte math so the DuckDB oracle verifies the whole Python
    boundary."""
    from pyspark.sql.types import DoubleType

    feat_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("byte_len", LongType()),
            StructField("space_ratio", DoubleType()),
            StructField("first_byte", LongType()),
        ]
    )

    def extract(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.map(len).astype("int64")
            spaces = payloads.map(lambda b: b.count(b" ")).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": n,
                    "space_ratio": spaces / n,
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else None).astype(
                        "int64"
                    ),
                }
            )

    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(extract, feat_schema)


@query(
    "grouped_map_zscore",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS zscore
    FROM events
    """,
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas): per-user z-score normalization
    computed in pandas per group, Arrow-batched — the §2.9 grouped-apply escape
    hatch, hash-checked against the equivalent window SQL. Prefer the pure
    window expression in production (the oracle IS that plan); this query
    exists to exercise and verify the UDF path itself."""
    from pyspark.sql.types import DoubleType

    from legate_pandas_spark.sources.tables import load_table as _lt

    ev = _lt(spark, sf_dir, "events").select("event_id", "user_id", "value")

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("zscore", DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        z = (pdf["value"] - pdf["value"].mean()) / std
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z.round(4)}
        )

    return ev.groupBy("user_id").applyInPandas(zscore, schema)


@query(
    "multimodal_frame_sample_plan",
    oracle="""
    WITH meta AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
        FROM documents
    )
    SELECT doc_id,
           CAST(unnest(range(0, least(byte_len // 100 + 1, 5))) AS BIGINT) AS frame_idx,
           CAST(byte_len AS BIGINT) AS byte_len
    FROM meta
    """,
)
def multimodal_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan for video-like payloads: one output row per sampled
    frame (up to 5, spaced by payload size). Explode keeps this a narrow,
    pipelined transform — the actual frame decode would be a downstream
    mapInPandas stage like decode_binary_metadata."""
    docs = load_table(spark, sf_dir, "documents")
    byte_len = F.length(F.encode("text", "UTF-8")).cast("long")
    n_frames = F.least(F.floor(byte_len / 100) + 1, F.lit(5)).cast("long")
    return docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), n_frames - 1)).alias("frame_idx"),
        byte_len.alias("byte_len"),
    )
