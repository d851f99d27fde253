"""Hypertable-style multi-resolution time rollups.

The continuous-aggregate pattern (TimescaleDB hypertables; in the
reference the equivalent is cascaded window TVF aggregations feeding
each other): one raw stream materialized at several time resolutions —
1 minute → 1 hour → 1 day — where each COARSER level is re-aggregated
from the level below, not from the raw data.

Scale rationale (100 TB): the raw scan happens ONCE, for the finest
resolution; every coarser level aggregates ~60× fewer rows than its
source. The naive alternative (one groupBy per resolution over raw)
scans the fact table R times. Requires the aggregates to be
re-aggregable: sum/count/min/max are; avg is carried as (sum, count)
and finalized per level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hypertable_rollup(
    df: DataFrame,
    ts: str,
    keys: list[str],
    value_col: str,
    resolutions: list[str] = ("1 minute", "1 hour", "1 day"),
) -> DataFrame:
    """Stacked rollup of cnt/sum/min/max/avg of ``value_col`` per key
    at each resolution (finest first). Output columns: resolution,
    bucket_start, *keys, cnt, total, vmin, vmax, avg — one row set per
    resolution, coarser levels derived from the previous level."""
    levels = []
    # finest level: the only scan of the raw input
    fine = (
        df.groupBy(F.window(ts, resolutions[0]).alias("__w"), *keys)
        .agg(
            F.count(value_col).alias("cnt"),
            F.sum(value_col).alias("total"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
        .select(
            F.lit(resolutions[0]).alias("resolution"),
            F.col("__w.start").alias("bucket_start"),
            *keys,
            "cnt",
            "total",
            "vmin",
            "vmax",
        )
    )
    levels.append(fine)
    prev = fine
    for res in resolutions[1:]:
        coarser = (
            prev.groupBy(F.window("bucket_start", res).alias("__w"), *keys)
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("total").alias("total"),
                F.min("vmin").alias("vmin"),
                F.max("vmax").alias("vmax"),
            )
            .select(
                F.lit(res).alias("resolution"),
                F.col("__w.start").alias("bucket_start"),
                *keys,
                "cnt",
                "total",
                "vmin",
                "vmax",
            )
        )
        levels.append(coarser)
        prev = coarser
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.withColumn("avg", F.col("total") / F.col("cnt"))
