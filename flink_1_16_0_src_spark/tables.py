"""Fixture table loading + temp-view registration.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
        # build it surfaces either as long (legacy nanosAsLong) or as
        # TIMESTAMP_NTZ (ns truncated to µs). Normalize both to
        # TIMESTAMP (session tz pinned to UTC ⇒ value-identical), which
        # unix_micros/withWatermark/window() require.
        from pyspark.sql import functions as F

        dtype = dict(df.dtypes).get("ts")
        if dtype == "bigint":
            # integer div — float division would lose precision on ns-epoch magnitudes
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    """Register each parquet table as a temp view; returns the frames.

    Scans stay lazy — Catalyst pushes filters/projections into the
    parquet reader per query (verify with .explain: PushedFilters).
    """
    out = {}
    for name in names:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
