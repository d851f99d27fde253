"""Window table-valued functions (SURVEY.md §2.3/§2.9).

Reference parity:
- TUMBLE/HOP TVF: SqlTumbleTableFunction.java:37, SqlHopTableFunction.java:38
  → Spark ``F.window(ts, size[, slide])`` (built-in).
- CUMULATE TVF: SqlCumulateTableFunction.java:37 + slicing runtime
  (SliceAssigners.java:94) — **no Spark builtin**: implemented here by
  exploding each row into the slice-end windows that contain it
  (JVM-side explode(sequence(...)), no Python in the hot path).
- SESSION windows: SessionWindowAssigner.java:36 →
  ``F.session_window`` (built-in, batch + streaming).

All helpers return the input with ``window_start`` / ``window_end``
columns appended — the TVF contract (reference
WindowTableFunctionOperator.java adds the same three columns; we skip
window_time — the TVF contract's three
columns; window_time = window_end - 1ms = TimeWindow.maxTimestamp,
the rowtime attribute cascading window aggregations group on).

Scale: tumble/hop/session group-bys shuffle once on (window, keys);
CUMULATE fan-out is bounded by max_size/step (a small constant), so
data volume grows by that factor pre-shuffle — same cost shape as
Flink's sliced execution without shared-pane state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumble(
    df: DataFrame, ts: str, size: str, offset: str | None = None,
    keep_struct: bool = False,
) -> DataFrame:
    """TUMBLE(ts, size [, offset]) — the optional offset shifts window
    boundaries (SqlTumbleTableFunction.java:37 third operand;
    TumblingWindowAssigner.withOffset). Spark: window()'s startTime."""
    if offset is None:
        return _with_window(df, F.window(ts, size), keep_struct)
    return _with_window(df, F.window(ts, size, size, offset), keep_struct)


def hop(
    df: DataFrame, ts: str, slide: str, size: str, offset: str | None = None,
    keep_struct: bool = False,
) -> DataFrame:
    if offset is None:
        return _with_window(df, F.window(ts, size, slide), keep_struct)
    return _with_window(df, F.window(ts, size, slide, offset), keep_struct)


def _with_window(df: DataFrame, w: Column, keep_struct: bool = False) -> DataFrame:
    # materialize the window struct ONCE — a sliding window expression
    # explodes rows where it is evaluated, so referencing it twice
    # (start + end) would square the fan-out. keep_struct retains the
    # raw ``__w`` TimeWindow column: STREAMING aggregation must group
    # by the struct itself (only it carries the event-time attribute —
    # extracted start/end columns lose the watermark linkage).
    out = (
        df.withColumn("__w", w)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .withColumn("window_time", F.col("__w.end") - F.expr("INTERVAL '0.001' SECOND"))
    )
    return out if keep_struct else out.drop("__w")


def cumulate(df: DataFrame, ts: str, step: str, max_size: str) -> DataFrame:
    """CUMULATE(ts, step, max_size): within each max_size span the
    window start is pinned to the span start and the end advances in
    ``step`` increments; a row belongs to every slice whose end is
    strictly after its timestamp (matches Flink's
    CumulativeSliceAssigner: expanding windows [start, start+k*step]).
    """
    step_i = F.expr(f"INTERVAL {step}")
    span = F.window(ts, max_size)
    n_slices = int(_duration_seconds(max_size) / _duration_seconds(step))
    ends = F.sequence(F.lit(1), F.lit(n_slices))
    return (
        df.withColumn("window_start", span.start)
        .withColumn("__k", F.explode(ends))
        .withColumn(
            "window_end",
            (
                F.col("window_start").cast("timestamp")
                + F.col("__k") * step_i
            ),
        )
        .where(F.col("window_end") > F.col(ts))
        .withColumn(
            "window_time", F.col("window_end") - F.expr("INTERVAL '0.001' SECOND")
        )
        .drop("__k")
    )


def session(df: DataFrame, ts: str, gap: str, *keys: str | Column) -> DataFrame:
    """Session windows via the builtin session_window aggregate helper —
    use inside groupBy: ``df.groupBy(F.session_window(ts, gap), *keys)``.
    This helper provides the batch gaps-and-islands equivalent that
    also yields per-row session assignment (window_start/end appended),
    which the TVF form requires."""
    from pyspark.sql import Window as W

    gap_i = F.expr(f"INTERVAL {gap}")
    gap_us = int(_duration_seconds(gap) * 1_000_000)
    w = W.partitionBy(*keys).orderBy(F.col(ts))
    # gap test on microsecond longs; first row per key (lag null) starts a session
    flagged = df.withColumn(
        "__new_session",
        F.coalesce(
            (
                F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(F.col(ts)).over(w)) > gap_us
            ).cast("int"),
            F.lit(1),
        ),
    )
    sess = flagged.withColumn(
        "__session_id", F.sum("__new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    bounds = W.partitionBy(*keys, "__session_id")
    return (
        sess.withColumn("window_start", F.min(ts).over(bounds))
        .withColumn("window_end", F.max(F.col(ts)).over(bounds) + gap_i)
        .withColumn(
            "window_time", F.col("window_end") - F.expr("INTERVAL '0.001' SECOND")
        )
        .drop("__new_session", "__session_id")
    )


def _duration_seconds(s: str) -> float:
    qty, unit = s.split()
    unit = unit.rstrip("s").lower()
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}[unit]
    return float(qty) * mult
