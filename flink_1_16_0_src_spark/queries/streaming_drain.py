"""Streaming-drain queries: the driver contract's window into
Structured Streaming execution.

Each query opens the fixture as a FILE STREAM (availableNow trigger),
runs a streaming operator graph, drains it into a memory sink, and
returns the emitted rows as a batch DataFrame — so the driver's oracle
comparison and the benchmark both exercise the real streaming path
(micro-batch planner, watermark bookkeeping, stateful agg), not a batch
rewrite. Oracle: append-mode emission = windows whose end <= final
watermark (max(ts) - delay), computable in plain SQL.

Reference parity: SURVEY.md §5.4 — the reference's streaming ITCases
drain a bounded stream and compare against batch SQL the same way;
bench M7 calls for a streaming-throughput headline number.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.streaming import sources as ssrc
from flink_1_16_0_src_spark.streaming import windows as swin

_seq = itertools.count()


@query(
    "stream_tumble_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    agg AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             event_type,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2, 3
    )
    SELECT window_start, window_end, event_type, n, sum_value
    FROM agg, wm WHERE agg.window_end <= wm.w
    """,
    tags=("streaming", "window"),
)
def stream_tumble_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream → watermark(10 min) → TUMBLE(1 hour) agg → append
    emission, drained with availableNow. Emitted set = windows closed
    by the final watermark — exactly the oracle's wm filter. This is
    the end-to-end streaming throughput representative (bench M7):
    source listing, micro-batch planning, state-store windowed agg,
    and sink commit are all on the timed path."""
    sdf = ssrc.stream_table(spark, sf_dir, "events", watermark=("ts", "10 minutes"))
    out = swin.tumble_agg(
        sdf, "ts", "1 hour", ["event_type"],
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    drained = ssrc.run_to_memory(out, f"drain_tumble_{next(_seq)}", "append")
    return drained.select("window_start", "window_end", "event_type", "n", "sum_value")
