"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (no image/audio libs in this container —
``codec='fake'`` produces deterministic pseudo-features; any real codec
raises NotImplementedError). The Spark-side plumbing is real and
tested: binary schema, metadata struct, Arrow-batched mapInPandas with
bounded batch sizes, partition-preserving transforms.

At 100 TB: binary payloads ride in parquet alongside metadata;
decode/feature-extract runs as mapInPandas over row-group-sized Arrow
batches (spark.sql.execution.arrow.maxRecordsPerBatch caps batch
memory); no shuffle is introduced — the pipeline stays narrow until an
explicit grouping.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_media_columns(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal frame from the documents fixture: payload =
    utf8 bytes of the text (stand-in for image bytes), typed metadata
    struct derived deterministically."""
    # note for consumers: Spark's base64() of this payload is MIME-
    # chunked (CRLF every 76 chars) — strip for canonical form
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.col(id_col) % 480).cast("int").alias("height"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = (
    "media_id long, n_bytes long, checksum long, width int, height int, feat array<double>"
)


def decode_features(df: DataFrame, codec: str = "fake", feat_dim: int = 4) -> DataFrame:
    """Decode payloads and emit fixed-width features via mapInPandas.

    ``codec='fake'``: deterministic features from the byte content
    (length, checksum, byte-histogram moments) — exercises the real
    Arrow batch path end-to-end. Real codecs (jpeg/png/wav/mp4) require
    imaging/audio libs not present in this container.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: only the deterministic 'fake' codec is available "
            "in this environment (no imaging/audio libraries baked in)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            checksum = payloads.map(lambda b: sum(b) % (1 << 31) if b is not None else 0)
            feats = [
                [
                    float(nb),
                    float(cs % 256),
                    float((cs >> 8) % 256),
                    float(nb % 7),
                ]
                for nb, cs in zip(n_bytes, checksum)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "checksum": checksum.astype("int64"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "feat": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize(df: DataFrame, width: int, height: int, codec: str = "fake") -> DataFrame:
    """Resize stub: rewrites the metadata struct to the target
    dimensions; the pixel transform itself needs an imaging lib (raises
    for real codecs). The metadata/schema plumbing — what a real
    implementation would keep identical — is exercised end-to-end."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: pixel-level resize needs an imaging library"
        )
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload every N bytes
    (JVM-side substring arithmetic — the video-frame analog of a
    stride sampler)."""
    n = F.octet_length("payload")
    idx = F.explode(F.sequence(F.lit(0), ((n - 1) / every_n_bytes).cast("int")))
    return df.select("media_id", F.col("meta"), idx.alias("frame_no"),).withColumn(
        "frame_offset", F.col("frame_no") * every_n_bytes
    )


def chunk_media(df: DataFrame, chunk_bytes: int = 64) -> DataFrame:
    """Split each binary payload into fixed-size ordered chunks —
    (media_id, chunk_idx, chunk, chunk_len). The 100 TB pattern for
    large blobs (video/audio): one multi-GB payload pins a whole task,
    chunking re-partitions decode work at byte-range granularity and
    each chunk carries its ordinal so a downstream groupBy(media_id,
    sort chunk_idx) reassembles losslessly. Pure JVM expressions:
    sequence + transform + substring-on-binary, exploded — no Python,
    no driver involvement."""
    chunks = F.expr(
        f"transform(sequence(0, int(ceil(octet_length(payload) / {chunk_bytes})) - 1),"
        f" i -> struct(i AS chunk_idx, substring(payload, i * {chunk_bytes} + 1, {chunk_bytes}) AS chunk))"
    )
    return (
        df.where(F.octet_length("payload") > 0)
        .select("media_id", F.explode(chunks).alias("__c"))
        .select(
            "media_id",
            F.col("__c.chunk_idx").cast("int").alias("chunk_idx"),
            F.col("__c.chunk").alias("chunk"),
            F.octet_length("__c.chunk").cast("int").alias("chunk_len"),
        )
    )
