"""Stream-stream joins.

Reference parity (SURVEY.md §2.4):
- Interval join (StreamExecIntervalJoin.java:82,
  TimeIntervalJoin.java) → builtin stream-stream join with a time-range
  predicate; both sides watermarked so buffered state is purged once
  the watermark passes the bound.
- Window join (StreamExecWindowJoin.java:69, WindowJoinOperator.java:66)
  → equi-join on the tumbling-window struct + keys; state dropped at
  window end.
- Unbounded stream-stream join with update output
  (StreamingJoinOperator.java:36) has no append-mode equivalent —
  stateful.py documents the gap and foreachBatch is the escape hatch.

Scale: both joins shuffle on (key [, window]); interval-join state is
O(rows within the time bound per key) — identical asymptotics to
Flink's dual keyed state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: tuple[str, str],
    time_cols: tuple[str, str],
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """``l.ts BETWEEN r.ts - lower AND r.ts + upper`` join. Both inputs
    must carry watermarks for state cleanup (append mode)."""
    lk, rk = key
    lt, rt = time_cols
    cond = (
        (left[lk] == right[rk])
        & (left[lt] >= right[rt] - F.expr(f"INTERVAL {lower}"))
        & (left[lt] <= right[rt] + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond, how)


def window_join(
    left: DataFrame,
    right: DataFrame,
    ts: tuple[str, str],
    size: str,
    keys: tuple[str, str],
    how: str = "inner",
) -> DataFrame:
    """Join rows that share the same tumbling window AND key."""
    lt, rt = ts
    lk, rk = keys
    lw = left.withColumn("window", F.window(lt, size))
    rw = right.withColumn("window", F.window(rt, size))
    cond = (lw["window"] == rw["window"]) & (lw[lk] == rw[rk])
    return lw.join(rw, cond, how)
