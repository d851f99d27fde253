"""Join operators beyond Spark's builtins.

Reference parity:
- Temporal / as-of join: EXEC-S/StreamExecTemporalJoin.java:77,
  T-RUNTIME/operators/join/temporal/TemporalRowTimeJoinOperator.java
  (FOR SYSTEM_TIME AS OF) — here as ``asof_join``.
- Lookup join: EXEC-S/StreamExecLookupJoin.java:56,
  T-RUNTIME/operators/join/lookup/LookupJoinRunner.java:34 — here as
  ``lookup_join`` (broadcast path) and ``batched_lookup_join``
  (mapInPandas external-probe path).
- Interval join: EXEC-S/StreamExecIntervalJoin.java:82 — Spark
  expresses it directly as a join with a time-range predicate
  (``interval_join`` convenience wrapper keeps the API parity).
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    how: str = "left",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: each left row gets the latest right row with
    ``right_time <= left_time`` for the same key (inclusive).

    Scale-first implementation: a single union + per-key window sort —
    one shuffle on the join key, NO range cross-product and NO
    per-group pandas. This survives 100 TB: state is one sort per key
    partition, skew handled by AQE. (The pandas ``merge_asof`` route
    would bound each key-group by executor memory instead.)

    ``tolerance``: optional max lookback (e.g. ``'30 days'``) — right
    matches older than that are nulled, mirroring Flink's temporal-join
    state TTL (TemporalRowTimeJoinOperator cleans state by watermark).
    """
    on = list(on)
    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c not in on and c != right_time]

    l_tag = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in on],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in rcols],
        F.lit(None).cast(dict(right.dtypes)[right_time]).alias("__rt"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in on],
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.col(right_time).alias("__rt"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal timestamps → inclusive <=
    w = Window.partitionBy(*on).orderBy("__t", "__side").rowsBetween(Window.unboundedPreceding, 0)
    filled = u.select(
        *on,
        "__t",
        "__side",
        *[c for c in lcols if c not in on],
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}") for c in rcols],
        F.last("__rt", ignorenulls=True).over(w).alias("__rt"),
    )
    out = filled.where(F.col("__side") == 1)
    if tolerance is not None:
        within = F.col("__rt") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *on,
            "__t",
            *[c for c in lcols if c not in on],
            *[F.when(within, F.col(f"__r_{c}")).alias(f"__r_{c}") for c in rcols],
            F.when(within, F.col("__rt")).alias("__rt"),
        )
    if how == "inner":
        out = out.where(F.col("__rt").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    return out.select(
        *[F.col(c) for c in on],
        F.col("__t").alias(left_time),
        *[F.col(c) for c in lcols if c not in on and c != left_time],
        *[F.col(f"__r_{c}").alias(c) for c in rcols],
        F.col("__rt").alias(right_time),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_time: Column,
    right_time: Column,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Interval join (reference TimeIntervalJoin.java):
    ``right_time BETWEEN left_time + lower AND left_time + upper``.
    Plain Spark join with a range predicate — Catalyst executes the
    equi-part as a hash/sort-merge join and the range as a post-filter,
    which is exactly Flink's batch strategy."""
    cond = (
        on
        & (right_time >= left_time + F.expr(f"INTERVAL {lower}"))
        & (right_time <= left_time + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond, how)


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Lookup (dimension) join — the in-catalog case: broadcast the dim
    table so every executor probes locally, no shuffle of the 100 TB
    fact side (reference LookupJoinRunner probes per row; broadcast
    hash join is the Spark-native equivalent)."""
    return fact.join(F.broadcast(dim), on, how)


def batched_lookup_join(
    fact: DataFrame,
    probe_fn: Callable[[Sequence], dict],
    key_col: str,
    result_schema: str,
) -> DataFrame:
    """Lookup join against an *external* KV system (reference
    AsyncLookupJoinRunner): batches each Arrow chunk's distinct keys
    into one probe call — per-partition batched I/O, never per-row.

    ``probe_fn(keys) -> {key: row_dict}`` is the user-supplied client;
    it runs on executors, so it must be picklable and create its own
    connection (standard Spark external-connector pattern).
    """
    import pandas as pd

    def run(iterator: Iterable["pd.DataFrame"]):
        for pdf in iterator:
            keys = pdf[key_col].dropna().unique().tolist()
            found = probe_fn(keys) if keys else {}
            extra = pdf[key_col].map(lambda k: found.get(k) or {})
            enriched = pd.DataFrame(list(extra), index=pdf.index)
            yield pd.concat([pdf, enriched], axis=1)

    return fact.mapInPandas(run, schema=result_schema)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    bounds: tuple[str, str],
    width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join as an EQUI-join via bucket
    expansion.

    The naive plan for ``p BETWEEN lo AND hi`` is a (broadcast) nested
    loop — O(|points|·|intervals|), the reference's
    BatchExecNestedLoopJoin fate for non-equi predicates. Bucketing
    turns it into a shuffle equi-join: points hash to bucket
    floor(p/width); each interval explodes into its covered buckets
    (≈ span/width + 1 rows, bounded by choosing ``width`` near the
    typical span); the join key is the bucket, the exact BETWEEN runs
    as a post-filter. Work is O(|points| + Σ span/width + |matches|) —
    linear, shuffle-partitioned, skew handled by AQE like any equi-join.

    Column names of the two inputs must be disjoint.
    """
    lo, hi = bounds
    clash = set(points.columns) & set(intervals.columns)
    assert not clash, f"column names must be disjoint, clash: {sorted(clash)}"
    b_pts = points.withColumn("__b", F.floor(F.col(point_col) / width))
    b_iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / width).cast("long"),
                F.floor(F.col(hi) / width).cast("long"),
            )
        ),
    )
    return (
        b_pts.join(b_iv, "__b", how)
        .where((F.col(point_col) >= F.col(lo)) & (F.col(point_col) <= F.col(hi)))
        .drop("__b")
    )
