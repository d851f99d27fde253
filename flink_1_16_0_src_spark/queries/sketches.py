"""Frequency-sketch queries (heavy hitters) — operators/sketch.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "sketch_heavy_hitters_users",
    oracle="""
    SELECT user_id, CAST(cnt AS BIGINT) AS cnt, CAST(rank_num AS INT) AS rank_num
    FROM (
      SELECT user_id, count(*) AS cnt,
             row_number() OVER (ORDER BY count(*) DESC, user_id) AS rank_num
      FROM events GROUP BY user_id
    ) WHERE rank_num <= 10
    """,
    tags=("sketch", "heavy-hitters", "custom-op"),
)
def sketch_heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass heavy hitters (per-partition Misra-Gries candidates →
    exact recount): top-10 most active users — identical to the exact
    groupBy top-k (the oracle) because capacity=512 dominates the key
    domain; at 100 TB the same shape bounds memory where the exact
    groupBy's key space would not."""
    from flink_1_16_0_src_spark.operators.sketch import approx_top_k

    ev = load(spark, sf_dir, "events")
    return approx_top_k(ev, "user_id", k=10, capacity=512)
