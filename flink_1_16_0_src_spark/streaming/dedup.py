"""Streaming deduplication.

Reference parity (SURVEY.md §2.6):
- StreamExecDeduplicate.java:85 keep-FIRST-row per key →
  ``dropDuplicates`` (state kept forever) or
  ``dropDuplicatesWithinWatermark`` (state freed by watermark — the
  production form at 100 TB/day: state is bounded by the watermark
  horizon, exactly like Flink's dedup state TTL).
- keep-LAST-row per key emits updates on every arrival → stateful.py
  (keep_last_dedup) since it needs update semantics.
- window dedup (StreamExecWindowDeduplicate.java:69) → dedupe on
  (window, keys): state dropped at window close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_keep_first(sdf: DataFrame, keys: list[str], within_watermark: bool = True) -> DataFrame:
    """First row per key wins; later duplicates are dropped.
    ``within_watermark=True`` bounds state by the watermark horizon
    (requires ``withWatermark`` upstream)."""
    if within_watermark:
        return sdf.dropDuplicatesWithinWatermark(keys)
    return sdf.dropDuplicates(keys)


def window_dedup_keep_first(sdf: DataFrame, ts: str, size: str, keys: list[str]) -> DataFrame:
    """First row per key within each tumbling window; state freed when
    the watermark passes the window. The raw ``ts`` column is replaced
    by window_start/window_end — streams allow only ONE event-time
    column, and the window struct inherits it from ``ts``."""
    return (
        sdf.withColumn("__w", F.window(ts, size))
        .drop(ts)  # the window struct is now the sole event-time column
        .dropDuplicates(["__w", *keys])
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )
