"""Bucketed (co-located) joins — shuffle elimination by physical
layout.

Reference parity: Flink's batch planner removes the Exchange when the
input's distribution already satisfies the join's required hash
distribution (BatchExecExchange.java:65 — FORWARD instead of HASH when
traits match). Spark's equivalent mechanism is bucketed tables: both
sides written with ``bucketBy(n, key)`` hash-place rows identically,
so SortMergeJoin runs with ZERO Exchange on either side.

At 100 TB this is the difference between re-shuffling the fact table
on every join and reading it pre-placed: bucket the canonical big
tables once (by their join key), and every subsequent join against a
same-bucketed table is exchange-free. The plan test asserts the
Exchange count is 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 32, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table — the one-time
    layout cost that buys exchange-free (and with ``sort`` also
    sort-free) joins on ``key`` forever after."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous interrupted write can leave the managed location behind,
    # which saveAsTable refuses to reuse — clear it
    loc = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(f"{loc.path}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; Catalyst sees matching output
    partitionings and plans SortMergeJoin with no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
