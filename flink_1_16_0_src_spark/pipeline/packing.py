"""Sequence packing for LLM training: assign documents to
fixed-token-budget bins (context windows) so a 100 TB corpus becomes
contiguous training sequences with minimal padding.

Semantics: documents are processed in a deterministic order (id order
within a hash bucket); a document's bin is ``floor(cum_tokens_before /
budget)`` — the standard streaming/prefix-sum packing. A bin's token
sum can exceed ``budget`` by less than one document (the overflow doc
starts the next bin's count); exact first-fit bin packing is inherently
sequential and NP-hard to optimize, while prefix packing is one window
pass and within one document of optimal padding for doc ≪ budget —
the trade every large-scale training pipeline makes.

Scale shape: one shuffle on the bucket key; the cumulative sum is a
running window inside each bucket. ``n_buckets`` bounds per-task state
(each bucket packs independently — bins never cross buckets), so
parallelism is n_buckets regardless of corpus size; raise it so a
bucket's documents fit one task comfortably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.pipeline.text import token_count


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each document a ``(bucket, bin_id)`` packing slot plus its
    offset inside the bin. Output columns: id, n_tokens, bucket,
    bin_id, bin_offset (token offset where this doc starts in its
    bin's concatenation)."""
    toks = token_count(F.col(text_col))
    bucket = F.pmod(F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("bigint"), F.lit(n_buckets))
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = df.select(
        F.col(id_col),
        toks.alias("n_tokens"),
        bucket.cast("int").alias("bucket"),
    ).withColumn("__cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return staged.select(
        id_col,
        "n_tokens",
        "bucket",
        F.floor(F.col("__cum_before") / budget).cast("bigint").alias("bin_id"),
        # token offset inside the bin: cum_before modulo budget when the
        # doc stays in its bin; docs that straddle restart accounting in
        # the next bin, so offset is cum_before - bin_id*budget
        (F.col("__cum_before") - F.floor(F.col("__cum_before") / budget) * budget)
        .cast("bigint")
        .alias("bin_offset"),
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bin fill statistics — the padding-waste report a training
    pipeline watches: docs per bin, token sum, fill ratio vs budget."""
    return (
        packed.groupBy("bucket", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .withColumn("fill_ratio", F.round(F.col("bin_tokens") / budget, 4))
    )
