"""Streaming window TVF aggregations.

Reference parity (SURVEY.md §2.3):
- StreamExecWindowAggregate.java:86 + SlicingWindowOperator.java:101
  (TUMBLE/HOP/CUMULATE TVF agg) → ``groupBy(F.window(...))`` with
  watermark; CUMULATE via the shared slice-explode helper
  (operators/windows.py) since Spark has no builtin.
- SessionWindowAssigner.java:36 → ``F.session_window`` (builtin,
  merging sessions supported in streaming).
- Late rows are dropped once the watermark passes window_end — same
  visible semantics as Flink SQL windows (which also drop late rows,
  SURVEY.md §2.9 "Late data handling").

Scale: one shuffle on (window, keys); partial aggregation happens
map-side automatically; state per open window only, freed by the
watermark — the same bounded-state story as Flink's sliced windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.operators.windows import cumulate as _cumulate_slices


def tumble_agg(
    sdf: DataFrame, ts: str, size: str, keys: list[str], *aggs: Column
) -> DataFrame:
    """GROUP BY TUMBLE(ts, size) [, keys] — append-mode capable."""
    return (
        sdf.groupBy(F.window(ts, size).alias("__w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def hop_agg(
    sdf: DataFrame, ts: str, slide: str, size: str, keys: list[str], *aggs: Column
) -> DataFrame:
    return (
        sdf.groupBy(F.window(ts, size, slide).alias("__w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def session_agg(
    sdf: DataFrame, ts: str, gap: str, keys: list[str], *aggs: Column
) -> DataFrame:
    """GROUP BY SESSION(ts, gap) — merging session windows, builtin."""
    return (
        sdf.groupBy(F.session_window(ts, gap).alias("__w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def window_topn(
    sdf: DataFrame,
    ts: str,
    size: str,
    keys: list[str],
    order_col: str,
    k: int,
    payload: list[str],
    descending: bool = True,
    slide: str | None = None,
) -> DataFrame:
    """Streaming window Top-N (StreamExecWindowRank.java:77): top-k rows
    per (window, keys), emitted when the window closes — an APPEND-mode
    composition (window agg collect → sort → slice → explode), no
    custom state op needed; state is freed at window end exactly like
    the reference's window-rank operator. ``slide`` makes the windows
    HOPPING (a row ranks in every window covering it — the reference's
    window rank runs on any window kind); default tumbling."""
    entry = F.struct(F.col(order_col).alias("__o"), *[F.col(c) for c in payload])
    sorted_entries = F.array_sort(F.collect_list(entry))
    top = F.slice(F.reverse(sorted_entries) if descending else sorted_entries, 1, k)
    exploded = (
        sdf.groupBy(F.window(ts, size, slide).alias("__w") if slide
                    else F.window(ts, size).alias("__w"), *keys)
        .agg(top.alias("__top"))
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            *keys,
            F.posexplode("__top").alias("rank0", "__e"),
        )
    )
    return exploded.select(
        "window_start",
        "window_end",
        *keys,
        (F.col("rank0") + 1).alias("rank_num"),
        F.col("__e.__o").alias(order_col),
        *[F.col(f"__e.{c}").alias(c) for c in payload],
    )


def cumulate_agg(
    sdf: DataFrame, ts: str, step: str, max_size: str, keys: list[str], *aggs: Column
) -> DataFrame:
    """CUMULATE TVF agg: slice-explode each row into its expanding
    windows, then aggregate per (window_start, window_end, keys).

    Streaming caveat: the group key is a derived timestamp rather than a
    ``window()`` struct, so Spark cannot prove append-closure — run in
    update/complete mode (or drain with availableNow). Row fan-out is
    bounded by max_size/step.
    """
    sliced = _cumulate_slices(sdf, ts, step, max_size)
    return sliced.groupBy("window_start", "window_end", *keys).agg(*aggs)
