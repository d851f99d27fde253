"""Scalar function conformance — math + temporal (SURVEY.md §2.11,
BuiltInFunctionDefinitions.java:960-1411 math, :1439-1560 temporal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.functions.scalar import temporal_overlaps, truncate_number
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "func_math_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4)            AS v_abs,
           round(exp(l_discount), 6)                   AS v_exp,
           round(ln(l_extendedprice), 6)               AS v_ln,
           round(log10(l_extendedprice), 6)            AS v_log10,
           round(log2(l_quantity + 1), 6)              AS v_log2,
           round(power(l_quantity, 2), 4)              AS v_pow,
           round(sqrt(l_extendedprice), 6)             AS v_sqrt,
           CAST(mod(CAST(l_quantity AS BIGINT), 7) AS BIGINT) AS v_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE)     AS v_sign,
           round(l_extendedprice, 1)                   AS v_round1,
           round(l_extendedprice, -2)                  AS v_round_neg,
           CAST(ceil(l_discount * 100) AS BIGINT)      AS v_ceil,
           CAST(floor(l_discount * 100) AS BIGINT)     AS v_floor,
           trunc(l_extendedprice * 100) / 100.0        AS v_trunc2
    FROM lineitem WHERE l_linenumber = 1 AND l_extendedprice > 0
    """,
    tags=("functions", "math"),
)
def func_math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic core: +,-,*,/, mod, abs, exp, ln/log10/log2, power, sqrt, sign, round (BuiltInFunctionDefinitions.java:960-1411)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_linenumber") == 1) & (F.col("l_extendedprice") > 0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("v_abs"),
        F.round(F.exp("l_discount"), 6).alias("v_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("v_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("v_log10"),
        F.round(F.log2(F.col("l_quantity") + 1), 6).alias("v_log2"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("v_pow"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("v_sqrt"),
        (F.col("l_quantity").cast("bigint") % 7).alias("v_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("v_sign"),
        F.round("l_extendedprice", 1).alias("v_round1"),
        F.round("l_extendedprice", -2).alias("v_round_neg"),
        F.ceil(F.col("l_discount") * 100).alias("v_ceil"),
        F.floor(F.col("l_discount") * 100).alias("v_floor"),
        truncate_number(F.col("l_extendedprice"), 2).alias("v_trunc2"),
    )


@query(
    "func_math_trig",
    oracle="""
    SELECT n_nationkey,
           round(sin(n_nationkey), 8)     AS v_sin,
           round(cos(n_nationkey), 8)     AS v_cos,
           round(tan(n_nationkey), 8)     AS v_tan,
           round(asin(1.0 / (n_nationkey + 2)), 8) AS v_asin,
           round(atan2(n_nationkey, 3), 8) AS v_atan2,
           round(1.0 / tan(n_nationkey + 1), 8) AS v_cot,
           round(degrees(n_nationkey), 6) AS v_deg,
           round(radians(n_nationkey), 8) AS v_rad,
           round(pi(), 8)                 AS v_pi
    FROM nation
    """,
    tags=("functions", "math"),
)
def func_math_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig family sin/cos/tan/asin/acos/atan/atan2 + degrees/radians (BuiltInFunctionDefinitions.java trig block)."""
    n = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        F.round(F.sin(k), 8).alias("v_sin"),
        F.round(F.cos(k), 8).alias("v_cos"),
        F.round(F.tan(k), 8).alias("v_tan"),
        F.round(F.asin(1.0 / (k + 2)), 8).alias("v_asin"),
        F.round(F.atan2(k.cast("double"), F.lit(3.0)), 8).alias("v_atan2"),
        F.round(1.0 / F.tan(k + 1), 8).alias("v_cot"),
        F.round(F.degrees(k), 6).alias("v_deg"),
        F.round(F.radians(k), 8).alias("v_rad"),
        F.round(F.lit(3.14159265358979), 8).alias("v_pi"),
    )


@query(
    "func_temporal",
    oracle="""
    SELECT o_orderkey,
           extract(year FROM o_orderdate)            AS y,
           extract(month FROM o_orderdate)           AS m,
           extract(day FROM o_orderdate)             AS d,
           extract(hour FROM o_orderdate)            AS h,
           dayofweek(o_orderdate)                    AS dow,
           extract(doy FROM o_orderdate)             AS doy,
           extract(quarter FROM o_orderdate)         AS q,
           strftime(o_orderdate, '%Y-%m-%d')         AS fmt,
           date_trunc('month', o_orderdate)          AS mon_start,
           o_orderdate + INTERVAL '90 days'          AS plus_90d,
           o_orderdate - INTERVAL '1 month'          AS minus_1mo,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
           CAST(epoch(o_orderdate) AS BIGINT)        AS epoch_s,
           make_timestamp(CAST(epoch(o_orderdate) AS BIGINT) * 1000000) AS from_epoch
    FROM orders
    """,
    tags=("functions", "temporal"),
)
def func_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT / dateFormat / timestampDiff / interval arithmetic /
    from_unixtime (BuiltInFunctionDefinitions.java:1439-1560).
    DuckDB dayofweek = Sunday 0; Spark dayofweek = Sunday 1 → -1."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("y"),
        F.month(d).cast("bigint").alias("m"),
        F.dayofmonth(d).cast("bigint").alias("d"),
        F.hour(d).cast("bigint").alias("h"),
        (F.dayofweek(d) - 1).cast("bigint").alias("dow"),
        F.dayofyear(d).cast("bigint").alias("doy"),
        F.quarter(d).cast("bigint").alias("q"),
        F.date_format(d, "yyyy-MM-dd").alias("fmt"),
        F.date_trunc("month", d).alias("mon_start"),
        (d + F.expr("INTERVAL 90 DAY")).alias("plus_90d"),
        (d - F.expr("INTERVAL 1 MONTH")).alias("minus_1mo"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.timestamp_seconds(F.unix_timestamp(d)).alias("from_epoch"),
    )


@query(
    "func_temporal_overlaps",
    oracle="""
    SELECT e.event_id,
           CASE WHEN e.ts <= o.o_orderdate + INTERVAL '30 days'
                 AND o.o_orderdate <= e.ts + INTERVAL '1 hour'
                THEN 1 ELSE 0 END AS overlaps_flag
    FROM events e JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderkey % 97 = 0
    """,
    tags=("functions", "temporal"),
)
def func_temporal_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL_OVERLAPS (BuiltInFunctionDefinitions.java:1475) via the
    functions.scalar shim."""
    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    j = e.join(o, e.user_id == o.o_custkey)
    return j.select(
        "event_id",
        temporal_overlaps(
            F.col("ts"),
            F.col("ts") + F.expr("INTERVAL 1 HOUR"),
            F.col("o_orderdate"),
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
        )
        .cast("int")
        .alias("overlaps_flag"),
    )


@query(
    "func_current_watermark",
    oracle="""
    SELECT event_id,
           max(ts) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             - INTERVAL '10 minutes' AS wm,
           CASE WHEN ts < max(ts) OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                          - INTERVAL '10 minutes'
                THEN 1 ELSE 0 END AS is_late
    FROM events WHERE event_id % 11 = 0
    """,
    tags=("functions", "temporal", "streaming"),
)
def func_current_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRENT_WATERMARK (BuiltInFunctionDefinitions.java:1754):
    arrival-ordered bounded-out-of-orderness watermark, NULL before the
    first row, emit-then-advance (late rows judged vs the PREVIOUS
    watermark) — the same contract streaming/late.LateRowRouter enforces
    across micro-batches. The global ``ORDER BY event_id`` running-max
    window is single-partition by construction: bounded-fixture-only
    (the 11-fold-decimated events replay), never a 100 TB scan — see
    functions/scalar.py:105 for the same caveat on the helper."""
    from flink_1_16_0_src_spark.functions.scalar import current_watermark

    e = load(spark, sf_dir, "events").where(F.col("event_id") % 11 == 0)
    wm = current_watermark(F.col("ts"), "10 MINUTES", F.col("event_id"))
    return e.select(
        "event_id",
        wm.alias("wm"),
        F.when(F.col("ts") < wm, 1).otherwise(0).alias("is_late"),
    )
