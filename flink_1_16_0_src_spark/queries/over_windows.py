"""OVER-window operator family (SURVEY.md §2.5).

Reference parity: EXEC-B/BatchExecOverAggregate.java:79 with its 13
frame implementations (T-RUNTIME/operators/over/frame/) and the ranking
agg functions (RowNumber/Rank/DenseRank/PercentRank/CumeDist/NTILE/
LeadLag AggFunction.java) → all Spark ``Window`` builtins; conformance
is what these queries pin down (frame bounds, ties, defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "over_ranking",
    oracle="""
    SELECT o_orderkey, o_custkey,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("over",),
)
def over_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER/RANK/DENSE_RANK over partitioned ordered windows (RankAggFunction family)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "over_percent_ntile",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS prnk,
           round(cume_dist()    OVER w, 6) AS cdist,
           ntile(4)             OVER w AS quartile
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("over",),
)
def over_percent_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK/CUME_DIST/NTILE window functions (PercentRankAggFunction, NTILEAggFunction)."""
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "over_lead_lag",
    oracle="""
    SELECT event_id, user_id,
           lag(event_type)        OVER w AS prev_type,
           lead(event_type)       OVER w AS next_type,
           lag(event_type, 2, 'NONE') OVER w AS prev2_type,
           round(lead(value, 1, -1.0) OVER w, 4) AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("over",),
)
def over_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD/LAG incl. offset + default (reference LeadLagAggFunction)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type", 2, "NONE").over(w).alias("prev2_type"),
        F.round(F.lead("value", 1, -1.0).over(w), 4).alias("next_value"),
    )


@query(
    "over_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM orders
    """,
    tags=("over",),
)
def over_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS UNBOUNDED PRECEDING frame (reference
    RowUnboundedPrecedingOverFrame.java)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "over_rows_sliding",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3,
           round(max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4) AS peak3
    FROM events
    """,
    tags=("over",),
)
def over_rows_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frames incl. FOLLOWING (reference
    RowSlidingOverFrame.java)."""
    ev = load(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(base.rowsBetween(-2, 0)), 4).alias("mavg3"),
        F.round(F.max("value").over(base.rowsBetween(-1, 1)), 4).alias("peak3"),
    )


@query(
    "over_range_between",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 2) AS sum_90d,
           count(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS n_90d
    FROM orders
    """,
    tags=("over",),
)
def over_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a 90-day lookback (reference
    RangeSlidingOverFrame.java; Flink's stream twin is
    RowTimeRangeBoundedPrecedingFunction.java:296). Spark's rangeBetween
    needs a numeric sort key → epoch seconds."""
    o = load(spark, sf_dir, "orders").withColumn(
        "__epoch", F.unix_timestamp("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("__epoch")
        .rangeBetween(-90 * 24 * 3600, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_90d"),
        F.count("*").over(w).alias("n_90d"),
    )


@query(
    "over_first_last_nth",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           first_value(l_partkey) OVER w AS first_part,
           last_value(l_partkey)  OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_part,
           nth_value(l_partkey, 2) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_part
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey)
    """,
    tags=("over",),
)
def over_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, l_linenumber) is NOT unique in the fixture — the
    l_partkey tiebreak makes first/last/nth deterministic on both sides."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(wfull).alias("last_part"),
        F.nth_value("l_partkey", 2).over(wfull).alias("second_part"),
    )


@query(
    "over_ignore_nulls",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN NULL
                  ELSE round(value, 2) END AS v
      FROM events
    )
    SELECT event_id, user_id,
           lag(v IGNORE NULLS)        OVER w AS prev_nn,
           lead(v IGNORE NULLS)       OVER w AS next_nn,
           first_value(v IGNORE NULLS) OVER w AS first_nn,
           last_value(v IGNORE NULLS)  OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_nn
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("over", "functions"),
)
def over_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS navigation in OVER windows — the reference's
    FIRST_VALUE/LAST_VALUE agg functions skip NULLs by design
    (FirstValueAggFunction.java accumulates only non-null values) and
    LEAD/LAG take the respect/ignore flag (LeadLagAggFunction.java):
    click rows carry a NULL measure, so every navigation skips over
    them. Catalyst lead/lag/first/last all take ignoreNulls natively —
    pure window plan, no Python."""
    ev = load(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "click", F.lit(None)).otherwise(
        F.round("value", 2)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = ev.select("event_id", "user_id", "ts", v.alias("v"))
    # lead/lag take IGNORE NULLS only through the SQL clause (the
    # Python wrappers don't expose the flag); first/last do natively
    return e.select(
        "event_id",
        "user_id",
        F.expr(
            "lag(v) IGNORE NULLS OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("prev_nn"),
        F.expr(
            "lead(v) IGNORE NULLS OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("next_nn"),
        F.first("v", ignorenulls=True).over(w).alias("first_nn"),
        F.last("v", ignorenulls=True).over(wrows).alias("last_nn"),
    )
