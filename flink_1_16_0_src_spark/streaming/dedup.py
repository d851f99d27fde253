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


def temporal_sort(
    sdf: DataFrame, ts: str, delay: str, keys: list[str]
) -> DataFrame:
    """Event-time-ordered emission (StreamExecTemporalSort.java:64 /
    RowTimeSortOperator.java): rows are buffered per key and released
    in timestamp order only once the carried bounded-out-of-orderness
    watermark (max seen ts − ``delay``, advancing monotonically across
    micro-batches) passes them — late-but-within-delay rows are
    re-ordered into place, exactly what the reference's operator uses
    its event-time timers for.

    Row order is guaranteed within each emitted per-key batch (Spark
    gives no cross-partition ordering downstream — same restriction the
    reference has across parallel subtasks). State = the not-yet-final
    tail per key, bounded by ``delay``."""
    import json

    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    state_schema = StructType(
        [
            StructField("buf", ArrayType(StringType())),
            StructField("clock", StringType()),
        ]
    )
    output_schema = sdf.schema
    delay_td = pd.Timedelta(delay)

    def fn(key, pdfs, state):
        if state.exists:
            buf = [json.loads(s) for s in state.get[0]]
            clock = pd.Timestamp(state.get[1]) if state.get[1] else None
        else:
            buf, clock = [], None
        for pdf in pdfs:
            for d in pdf.to_dict("records"):
                d = json.loads(json.dumps(d, default=str))
                buf.append(d)
                t = pd.Timestamp(d[ts])
                clock = t if clock is None else max(clock, t)
        out, keep = [], []
        wm = clock - delay_td if clock is not None else None
        for d in buf:
            (out if wm is not None and pd.Timestamp(d[ts]) <= wm else keep).append(d)
        out.sort(key=lambda d: pd.Timestamp(d[ts]))
        state.update(
            ([json.dumps(d) for d in keep], clock.isoformat() if clock else None)
        )
        cols = [f.name for f in output_schema.fields]
        res = pd.DataFrame(out, columns=cols)
        for f in output_schema.fields:
            if "timestamp" in f.dataType.simpleString():
                res[f.name] = pd.to_datetime(res[f.name])
        yield res

    return sdf.groupBy(*keys).applyInPandasWithState(
        fn, output_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
