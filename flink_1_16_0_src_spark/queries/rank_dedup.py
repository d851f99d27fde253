"""Rank / Top-N / deduplicate family (SURVEY.md §2.6) — batch queries
over the custom operators in operators/rank.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.operators.rank import deduplicate, top_n
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "topn_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name, round(p_retailprice, 2) AS price, rank_num
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rank_num
      FROM part
    ) WHERE rank_num <= 3
    """,
    tags=("rank",),
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by price per brand (reference BatchExecRank.java:46;
    stream twin AppendOnlyTopNFunction.java)."""
    p = load(spark, sf_dir, "part")
    return top_n(
        p,
        ["p_brand"],
        [F.col("p_retailprice").desc(), F.col("p_partkey")],
        3,
    ).select("p_brand", "p_partkey", "p_name", F.round("p_retailprice", 2).alias("price"), "rank_num")


@query(
    "topn_rank_with_ties",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity, rank_num
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rank_num
      FROM lineitem
    ) WHERE rank_num <= 2
    """,
    tags=("rank",),
)
def topn_rank_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK-based top-n keeps ties (Flink RankType.RANK)."""
    li = load(spark, sf_dir, "lineitem")
    return top_n(
        li,
        ["l_returnflag"],
        [F.col("l_quantity").desc()],
        2,
        rank_function="rank",
    ).select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity", "rank_num")


@query(
    "dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id, ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("dedup",),
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicate keep-first (reference RowTimeDeduplicateFunction,
    keepLastRow=false): earliest event per (user, type)."""
    ev = load(spark, sf_dir, "events")
    return deduplicate(
        ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")], keep="first"
    ).select("user_id", "event_type", "event_id", "ts")


@query(
    "dedup_keep_last",
    oracle="""
    SELECT user_id, event_type, event_id, ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("dedup",),
)
def dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicate keep-last (reference
    ProcTimeDeduplicateKeepLastRowFunction.java:32)."""
    ev = load(spark, sf_dir, "events")
    return deduplicate(
        ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")], keep="last"
    ).select("user_id", "event_type", "event_id", "ts")


@query(
    "window_topn",
    oracle="""
    SELECT wstart, event_type, event_id, value, rank_num
    FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type, event_id, value,
             row_number() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts), event_type
                                ORDER BY value DESC, event_id) AS rank_num
      FROM events
    ) WHERE rank_num <= 2
    """,
    tags=("rank", "window"),
)
def window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window Top-N (reference StreamExecWindowRank.java:77): top-2
    events by value per (1h tumble window, type). Batch form; state
    naturally bounded by the window in streaming."""
    ev = load(spark, sf_dir, "events")
    withw = ev.withColumn("wstart", F.window("ts", "1 hour").start)
    return top_n(
        withw,
        ["wstart", "event_type"],
        [F.col("value").desc(), F.col("event_id")],
        2,
    ).select("wstart", "event_type", "event_id", "value", "rank_num")


@query(
    "window_dedup",
    oracle="""
    SELECT wstart, user_id, event_id, ts
    FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, user_id, event_id, ts,
             row_number() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts), user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("dedup", "window"),
)
def window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window deduplicate (reference StreamExecWindowDeduplicate.java:69):
    first event per user per 1h tumble window."""
    ev = load(spark, sf_dir, "events")
    withw = ev.withColumn("wstart", F.window("ts", "1 hour").start)
    return deduplicate(
        withw, ["wstart", "user_id"], [F.col("ts"), F.col("event_id")], keep="first"
    ).select("wstart", "user_id", "event_id", "ts")
