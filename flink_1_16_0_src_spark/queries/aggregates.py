"""Aggregation operator family (SURVEY.md §2.3).

Reference parity targets:
- batch hash/sort agg: EXEC-B/BatchExecHashAggregate.java:52,
  BatchExecSortAggregate.java:51 → Spark HashAggregateExec /
  SortAggregateExec via df.groupBy().agg() (two-phase partial/final is
  automatic, matching Flink's EnforceLocalHashAggRule).
- aggregate function library: T-PLANNER/.../functions/aggfunctions/
  (Count/Sum/Avg/MinMax/Stddev/Var/FirstValue/LastValue/ListAgg) and
  T-RUNTIME/functions/aggregate/BatchApproxCountDistinctAggFunctions.java
  (HyperLogLog++) → Spark built-ins.
- grouping sets / cube / rollup: DecomposeGroupingSetsRule.scala:159 →
  Spark GROUPING SETS (Catalyst Expand, same decomposition).

Scale notes: all queries here are shuffle-on-group-key hash aggregates
with map-side partial aggregation; no driver-side collection. At 100 TB
the only knob is shuffle partition count (AQE coalesces), no skew risk
on these low-cardinality keys because partial agg collapses rows before
the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "agg_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
)
def agg_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the reference's own batch-agg gate
    (flink-end-to-end-tests/flink-tpch-test). Hash agg, 6 aggregates,
    2 group keys."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "tpch", "flagship"),
)
def agg_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: scan→filter→project→global agg. The filters push into
    the parquet scan (PushedFilters), reference's simplest e2e query
    (test-scripts/test-data/tpch/modified-query/q6.sql)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_orderkey)                    AS distinct_orders,
           count(DISTINCT l_suppkey)                     AS distinct_supps,
           CAST(sum(DISTINCT l_linenumber) AS BIGINT)    AS sum_distinct_ln,
           count(*)                                      AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (reference:
    FlinkAggregateExpandDistinctAggregatesRule.java — Catalyst expands
    multi-distinct through the same Expand-based rewrite)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("distinct_orders"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.sum_distinct(F.col("l_linenumber").cast("bigint")).alias("sum_distinct_ln"),
        F.count("*").alias("n"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT o_orderstatus,
           round(stddev_pop(o_totalprice), 4)  AS std_pop,
           round(stddev_samp(o_totalprice), 4) AS std_samp,
           round(var_pop(o_totalprice), 4)     AS v_pop,
           round(var_samp(o_totalprice), 4)    AS v_samp,
           round(min(o_totalprice), 2)         AS min_price,
           round(max(o_totalprice), 2)         AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STDDEV_POP/SAMP, VAR_POP/SAMP, MIN/MAX (reference planner
    aggfunctions Stddev*/Var*AggFunction)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_pop("o_totalprice"), 4).alias("std_pop"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("std_samp"),
        F.round(F.var_pop("o_totalprice"), 4).alias("v_pop"),
        F.round(F.var_samp("o_totalprice"), 4).alias("v_samp"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "agg_first_last_value",
    oracle="""
    SELECT user_id,
           min_by(event_type, ts)  AS first_type,
           max_by(event_type, ts)  AS last_type,
           min_by(value, event_id) AS first_val_by_id,
           max_by(value, event_id) AS last_val_by_id
    FROM events
    GROUP BY user_id
    """,
    tags=("agg",),
)
def agg_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE aggregate semantics (reference
    FirstValueAggFunction.java / LastValueWithRetractAggFunction.java):
    Flink's FIRST_VALUE takes the earliest-arriving row; deterministic
    batch analog = value at min/max of an ordering column, i.e. Spark
    min_by/max_by."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("first_type"),
        F.max_by("event_type", "ts").alias("last_type"),
        F.min_by("value", "event_id").alias("first_val_by_id"),
        F.max_by("value", "event_id").alias("last_val_by_id"),
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           string_agg(n_name, '|' ORDER BY n_name) AS names_ws
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("agg",),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / LISTAGG WS (reference ListAggWithRetractAggFunction,
    ListAggWsWithRetractAggFunction) = sorted collect_list + array_join.
    Sorting makes the result order-deterministic, which Flink only
    guarantees by arrival order (documented difference)."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names"),
        F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("names_ws"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("agg", "expand"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (reference DecomposeGroupingSetsRule.scala:159 →
    Expand + agg; Catalyst does the identical Expand decomposition —
    check .explain for the Expand node)."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "expand"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE via DataFrame API df.cube()."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count("*").alias("n"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "expand"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP via DataFrame API df.rollup()."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count("*").alias("n"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CASE WHEN approx_count_distinct(l_orderkey)
                     BETWEEN 0.95 * count(DISTINCT l_orderkey)
                         AND 1.05 * count(DISTINCT l_orderkey)
                THEN 1 ELSE 0 END AS approx_within_5pct,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROX_COUNT_DISTINCT (reference
    T-RUNTIME/functions/aggregate/hyperloglog/HyperLogLogPlusPlus.java:26
    — Flink uses the same HLL++ algorithm Spark's builtin implements).
    Raw sketch estimates aren't hash-comparable across engines, so the
    oracle contract is each engine's own estimate landing within 5% of
    its exact distinct count — plus the exact count itself, which IS
    engine-independent."""
    li = load(spark, sf_dir, "lineitem")
    exact = F.count_distinct("l_orderkey")
    approx = F.approx_count_distinct("l_orderkey", 0.01)
    return li.groupBy("l_returnflag").agg(
        exact.cast("bigint").alias("exact_orders"),
        ((approx >= 0.95 * exact) & (approx <= 1.05 * exact))
        .cast("int")
        .alias("approx_within_5pct"),
        F.count("*").alias("n"),
    )


@query(
    "agg_having_filter",
    oracle="""
    SELECT l_suppkey, round(sum(l_extendedprice), 2) AS total, count(*) AS n
    FROM lineitem
    GROUP BY l_suppkey
    HAVING sum(l_extendedprice) > 100000 AND count(*) > 10
    """,
    tags=("agg",),
)
def agg_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-agg filter (Calc above agg in the reference plan)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.sum("l_extendedprice").alias("_total"),
            F.count("*").alias("n"),
        )
        .where((F.col("_total") > 100000) & (F.col("n") > 10))
        .select(
            "l_suppkey",
            F.round(F.col("_total"), 2).alias("total"),
            "n",
        )
    )
