"""Multimodal-column pipeline queries (BASELINE.json north-star
extras): binary payloads + typed metadata + stubbed decode
(pipeline.multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.pipeline.multimodal import (
    attach_media_columns,
    decode_features,
)
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'fake' AS format,
           CAST(length(text) % 640 AS INT) AS width,
           CAST(doc_id % 480 AS INT) AS height,
           octet_length(encode(text)) AS n_bytes,
           to_base64(encode(text)) AS payload_b64
    FROM documents
    """,
    tags=("pipeline", "multimodal"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct plumbing: media table built from
    documents (payload = utf8 bytes standing in for image bytes)."""
    media = attach_media_columns(load(spark, sf_dir, "documents"), "text", "doc_id")
    return media.select(
        "media_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        # Spark base64 is MIME-chunked with CRLF every 76 chars; strip
        # for the canonical single-line form DuckDB emits
        F.regexp_replace(F.base64(F.col("payload")), r"[\r\n]", "").alias("payload_b64"),
    )


@query(
    "multimodal_decode_fake",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(list_aggregate(list_transform(str_split(text, ''), c -> unicode(c)), 'sum')
             % 2147483648 AS BIGINT) AS checksum,
           CAST(length(text) % 640 AS INT) AS width,
           CAST(doc_id % 480 AS INT) AS height
    FROM documents
    """,
    tags=("pipeline", "multimodal", "custom-op"),
)
def multimodal_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path with the deterministic fake codec:
    Arrow batches in, feature rows out (real decode stubbed — no
    imaging libs in the container; oracle checks byte-sum checksum =
    sum of codepoints for the ASCII fixture text)."""
    media = attach_media_columns(load(spark, sf_dir, "documents"), "text", "doc_id")
    return decode_features(media, codec="fake").select(
        "media_id", "n_bytes", "checksum", "width", "height"
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT media_id,
           CAST(frame_no AS BIGINT)      AS frame_no,
           CAST(frame_no * 64 AS BIGINT) AS frame_offset,
           CAST(n_bytes AS BIGINT)       AS n_bytes
    FROM (
      SELECT doc_id AS media_id,
             unnest(generate_series(0, (octet_length(encode(text)) - 1) // 64))
               AS frame_no,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    """,
    tags=("pipeline", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride frame sampler (video-frame analog): one row per 64-byte
    frame of each payload, JVM-side sequence+explode — fan-out bounded
    by payload size / stride."""
    from flink_1_16_0_src_spark.pipeline.multimodal import frame_sample

    media = attach_media_columns(load(spark, sf_dir, "documents"), "text", "doc_id")
    return frame_sample(media, every_n_bytes=64).select(
        "media_id",
        F.col("frame_no").cast("bigint").alias("frame_no"),
        F.col("frame_offset").cast("bigint").alias("frame_offset"),
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
    )


@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id AS media_id, 'fake' AS format,
           224 AS width, 224 AS height,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
    tags=("pipeline", "multimodal"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stub round-trip: metadata struct rewritten to the target
    dimensions, payload byte count preserved (pixel transform stubbed —
    no imaging libs in the container)."""
    from flink_1_16_0_src_spark.pipeline.multimodal import resize

    media = attach_media_columns(load(spark, sf_dir, "documents"), "text", "doc_id")
    return resize(media, 224, 224).select(
        "media_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@query(
    "multimodal_chunking",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, encode(text) AS payload
      FROM documents WHERE doc_id % 19 = 0 AND len(text) > 0
    ), idx AS (
      SELECT media_id, payload, unnest(range(0, CAST(ceil(octet_length(payload) / 64.0) AS BIGINT))) AS chunk_idx
      FROM media
    )
    SELECT media_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(least(64, octet_length(payload) - chunk_idx * 64) AS INTEGER) AS chunk_len
    FROM idx
    """,
    tags=("pipeline", "multimodal"),
)
def multimodal_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary chunking for parallel decode (byte-range work units with
    reassembly ordinals); conformance on chunk count/ordinals/lengths —
    the byte slices themselves are checked by the Spark-side
    reassembly test."""
    from flink_1_16_0_src_spark.pipeline.multimodal import attach_media_columns, chunk_media

    d = load(spark, sf_dir, "documents").where(
        (F.col("doc_id") % 19 == 0) & (F.length("text") > 0)
    )
    media = attach_media_columns(d, "text", "doc_id")
    return chunk_media(media, 64).select("media_id", "chunk_idx", "chunk_len")
