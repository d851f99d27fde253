"""Multimodal binary-column plumbing tests (BASELINE.json north-star):
chunking reassembles byte-exactly; decode/resize stubs covered by
oracle queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_16_0_src_spark import tables
from flink_1_16_0_src_spark.pipeline.multimodal import attach_media_columns, chunk_media

SF_DIR = "/root/testdata/sf0.001"


def test_chunking_reassembles_byte_exact(spark):
    d = tables.load(spark, SF_DIR, "documents").where(
        (F.col("doc_id") % 37 == 0) & (F.length("text") > 0)
    )
    media = attach_media_columns(d, "text", "doc_id")
    chunks = chunk_media(media, chunk_bytes=50)

    # every chunk except possibly the last is exactly chunk_bytes long
    bad = chunks.join(
        chunks.groupBy("media_id").agg(F.max("chunk_idx").alias("last_idx")), "media_id"
    ).where((F.col("chunk_idx") < F.col("last_idx")) & (F.col("chunk_len") != 50))
    assert bad.count() == 0

    reassembled = (
        chunks.groupBy("media_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_idx", "chunk"))
            ).alias("ordered")
        )
        .select(
            "media_id",
            F.aggregate(
                "ordered",
                F.lit(b"").cast("binary"),
                lambda acc, x: F.concat(acc, x["chunk"]),
            ).alias("payload"),
        )
    )
    orig = {r.media_id: bytes(r.payload) for r in media.collect()}
    back = {r.media_id: bytes(r.payload) for r in reassembled.collect()}
    assert back == orig and len(back) > 0
