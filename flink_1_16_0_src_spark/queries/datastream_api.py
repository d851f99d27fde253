"""DataStream fluent-API queries with DuckDB oracles (SURVEY.md §2.10).

The DataStream surface is unit-tested in test_datastream.py; these
registry entries additionally put its core aggregating paths under the
driver's value-hash gate: minBy/maxBy (KeyedStream.java:915,940),
reduce (:769) via an order-insensitive fold, and coGroup
(DataStream.java:760).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.datastream import DataStream
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "ds_min_by_max_by",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id, "value",
             min("value") OVER (PARTITION BY user_id) AS mv,
             max("value") OVER (PARTITION BY user_id) AS xv
      FROM events
    )
    SELECT user_id,
           min(CASE WHEN "value" = mv THEN event_id END) AS min_event_id,
           round(min("value"), 4) AS min_value,
           min(CASE WHEN "value" = xv THEN event_id END) AS max_event_id,
           round(max("value"), 4) AS max_value
    FROM x GROUP BY user_id
    """,
    tags=("datastream",),
)
def ds_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minBy/maxBy keep the whole row holding the extreme value. Ties
    on the value are broken by the smallest event_id on BOTH sides
    (Flink's minBy(first=true) determinism knob): the stream carries a
    (value, event_id) struct ordering column through the same
    KeyedStream API."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    ev_min = ev.withColumn("__ord", F.struct("value", "event_id"))
    ev_max = ev.withColumn(
        "__ord", F.struct("value", (-F.col("event_id")).alias("event_id"))
    )
    mins = DataStream(ev_min).key_by("user_id").min_by("__ord").df.select(
        "user_id",
        F.col("event_id").alias("min_event_id"),
        F.round("value", 4).alias("min_value"),
    )
    maxs = DataStream(ev_max).key_by("user_id").max_by("__ord").df.select(
        "user_id",
        F.col("event_id").alias("max_event_id"),
        F.round("value", 4).alias("max_value"),
    )
    return mins.join(maxs, "user_id")


@query(
    "ds_keyed_reduce",
    oracle="""
    SELECT user_id, round(sum("value"), 4) AS value, min(event_id) AS event_id
    FROM events GROUP BY user_id
    """,
    tags=("datastream",),
)
def ds_keyed_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReduceFunction fold per key — the fold is commutative/
    associative (sum + min) so the result is arrival-order independent
    and SQL-checkable."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def fold(acc, r):
        return {
            "user_id": acc["user_id"],
            "event_id": min(acc["event_id"], r["event_id"]),
            "value": acc["value"] + r["value"],
        }

    out = DataStream(ev).key_by("user_id").reduce(
        fold, "user_id long, event_id long, value double"
    )
    return out.df.select("user_id", F.round("value", 4).alias("value"), "event_id")


@query(
    "ds_co_group",
    oracle="""
    WITH l AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey),
         r AS (SELECT c_custkey, count(*) AS n_cust FROM customer GROUP BY c_custkey)
    SELECT coalesce(l.o_custkey, r.c_custkey) AS custkey,
           coalesce(l.n_orders, 0) AS n_orders,
           coalesce(r.n_cust, 0) AS n_cust
    FROM l FULL OUTER JOIN r ON l.o_custkey = r.c_custkey
    """,
    tags=("datastream",),
)
def ds_co_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coGroup: both sides' rows for a key in one call (cogroup +
    applyInPandas) — CoGroupFunction contract, counted per side."""
    o = load(spark, sf_dir, "orders").select("o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey")

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        key = lpdf["o_custkey"].iloc[0] if len(lpdf) else rpdf["c_custkey"].iloc[0]
        return pd.DataFrame(
            [{"custkey": key, "n_orders": len(lpdf), "n_cust": len(rpdf)}]
        )

    out = DataStream(o).co_group(
        DataStream(c), ["o_custkey"], ["c_custkey"], fn,
        "custkey long, n_orders long, n_cust long",
    )
    return out.df


@query(
    "ds_async_io_enrich",
    oracle="""
    SELECT event_id, round(value * 2, 4) AS doubled,
           CAST(event_id % 16 AS BIGINT) AS shard
    FROM events WHERE event_id < 3000
    """,
    tags=("datastream", "async-io"),
)
def ds_async_io_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AsyncDataStream.orderedWait analog (AsyncWaitOperator.java:91):
    per-row 'requests' run on a 8-thread pool per Arrow batch. The
    request function here is pure (so the oracle can replay it in SQL);
    the threading/ordering machinery is identical for a real external
    call."""
    ev = load(spark, sf_dir, "events").where("event_id < 3000").select("event_id", "value")

    def request(row):
        return {
            "event_id": row["event_id"],
            "doubled": round(row["value"] * 2, 4),
            "shard": row["event_id"] % 16,
        }

    return DataStream(ev).async_io(
        request, "event_id long, doubled double, shard long", capacity=8
    ).df


@query(
    "ds_iterate_halving",
    oracle="""
    WITH RECURSIVE halve AS (
      SELECT o_orderkey AS id, o_totalprice AS v
      FROM orders WHERE o_orderkey < 500
      UNION ALL
      SELECT id, v / 2 FROM halve WHERE v >= 1000
    )
    SELECT id, round(min(v), 6) AS final_v
    FROM halve GROUP BY id
    """,
    tags=("datastream", "iterate"),
)
def ds_iterate_halving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataStream.iterate (DataStream.java:553 + closeWith): the
    driver-coordinated superstep loop halves each value until it drops
    below the threshold; rows still above re-enter as feedback.
    Deterministic and float-exact (binary halving), so a recursive CTE
    replays it — the iterative-computation surface gets a value-checked
    driver row."""
    o = load(spark, sf_dir, "orders").where("o_orderkey < 500").select(
        F.col("o_orderkey").alias("id"), F.col("o_totalprice").alias("v")
    )

    def step(ds: DataStream):
        # rows below the threshold exit with their CURRENT value; only
        # rows still above it are halved and fed back (the CTE recurses
        # under the same condition)
        done = ds.df.where(F.col("v") < 1000)
        fb = ds.df.where(F.col("v") >= 1000).withColumn("v", F.col("v") / 2)
        return DataStream(fb), DataStream(done)

    out = DataStream(o).iterate(step, max_iterations=64)
    return out.df.select("id", F.round("v", 6).alias("final_v"))


@query(
    "ds_table_agg_top2",
    oracle="""
    SELECT user_id, rank_num, round(value, 2) AS value FROM (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC) AS rank_num
      FROM events
    ) WHERE rank_num <= 2
    """,
    tags=("datastream", "udtaf"),
)
def ds_table_agg_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableAggregateFunction (flatAggregate) — Flink's canonical Top2
    example (TableAggregateFunction.java javadoc): the accumulator
    keeps the two largest values per key; emit_value yields one row per
    held value with its rank."""
    from flink_1_16_0_src_spark.datastream import DataStream

    ev = load(spark, sf_dir, "events").select("user_id", "value")

    def create_acc():
        return {"first": None, "second": None}

    def accumulate(acc, row):
        v = float(row["value"])
        if acc["first"] is None or v > acc["first"]:
            acc["second"], acc["first"] = acc["first"], v
        elif acc["second"] is None or v > acc["second"]:
            acc["second"] = v

    def emit_value(acc):
        if acc["first"] is not None:
            yield {"rank_num": 1, "value": round(acc["first"], 2)}
        if acc["second"] is not None:
            yield {"rank_num": 2, "value": round(acc["second"], 2)}

    return (
        DataStream(ev)
        .key_by("user_id")
        .flat_aggregate(
            create_acc, accumulate, emit_value,
            "user_id bigint, rank_num int, value double",
        )
        .df
    )


@query(
    "bridge_to_changelog_stream",
    oracle="""
    WITH v AS (
      SELECT user_id, event_type, ts, round(value, 2) AS value,
             lag(round(value, 2)) OVER w AS prev_value,
             lag(ts) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts)
    )
    SELECT user_id, event_type, ts, value, '+I' AS rowkind
    FROM v WHERE prev_ts IS NULL
    UNION ALL
    SELECT user_id, event_type, prev_ts, prev_value, '-U'
    FROM v WHERE prev_ts IS NOT NULL
    UNION ALL
    SELECT user_id, event_type, ts, value, '+U'
    FROM v WHERE prev_ts IS NOT NULL
    """,
    tags=("bridge", "changelog"),
)
def bridge_to_changelog_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StreamTableEnvironment.toChangelogStream (SURVEY §3.3 bridge):
    the per-(user, event_type) version history of events replays as
    +I / -U(prev image) / +U(cur image) — pure lag()-window Catalyst
    expressions; the oracle reconstructs the same changelog with
    UNIONed lag projections."""
    from flink_1_16_0_src_spark.session import TableEnvironment

    tenv = TableEnvironment(spark)
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", F.round("value", 2).alias("value")
    )
    out = tenv.to_changelog_stream(ev, keys=["user_id", "event_type"], order_col="ts")
    return out.select(
        "user_id", "event_type", "ts", "value", F.col("__rowkind").alias("rowkind")
    )
