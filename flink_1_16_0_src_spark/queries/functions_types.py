"""Type-system hardening — TIME(p) and INTERVAL parity (SURVEY.md §1.3).

The reference models TIME(p) as int millis-of-day
(T-COMMON/types/logical/TimeType.java; RowData stores TIME via getInt)
and has first-class INTERVAL YEAR TO MONTH / DAY TO SECOND types
(YearMonthIntervalType.java, DayTimeIntervalType.java). Spark maps:
TIME → bigint millis-of-day (functions/scalar.py shims), intervals →
YearMonthIntervalType/DayTimeIntervalType builtins. These queries pin
the representations against DuckDB, which HAS native TIME/INTERVAL —
so the oracle exercises real TIME/INTERVAL semantics while the Spark
side proves the documented mapping reproduces them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.functions.scalar import time_from_millis, time_of_day_millis
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "func_time_type",
    oracle="""
    SELECT event_id,
           CAST(datediff('millisecond', TIME '00:00:00', CAST(ts AS TIME)) AS BIGINT)
             AS tod_ms,
           strftime(ts, '%H:%M:%S.%g')                       AS tod_str,
           CASE WHEN CAST(ts AS TIME) > TIME '12:00:00' THEN 1 ELSE 0 END
             AS is_pm,
           CAST((datediff('millisecond', TIME '00:00:00', CAST(ts AS TIME))
                 + 5400000) % 86400000 AS BIGINT)            AS plus_90m_wrap
    FROM events WHERE event_id % 7 = 0
    """,
    tags=("functions", "types"),
)
def func_time_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME(p) as millis-of-day (TimeType.java): extraction from a
    timestamp, cast-to-string rendering, time-of-day comparison, and
    wraparound arithmetic — DuckDB's native TIME is the oracle."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") % 7 == 0)
    tod = time_of_day_millis(F.col("ts"))
    return e.select(
        "event_id",
        tod.alias("tod_ms"),
        time_from_millis(tod).alias("tod_str"),
        (tod > 12 * 3600000).cast("int").alias("is_pm"),
        ((tod + 5400000) % 86400000).alias("plus_90m_wrap"),
    )


@query(
    "func_interval_types",
    oracle="""
    SELECT o_orderkey,
           CAST((extract(year FROM o_orderdate) * 12 + extract(month FROM o_orderdate))
                - (1995 * 12 + 1) AS BIGINT)                       AS months_since,
           CAST(extract(day FROM (o_orderdate - TIMESTAMP '1995-01-01 00:00:00'))
                AS BIGINT)                                         AS dt_interval_days,
           o_orderdate + INTERVAL '36 hours'                       AS plus_36h,
           o_orderdate - INTERVAL '90 minutes'                     AS minus_90m,
           o_orderdate + INTERVAL '1 year 2 months'                AS plus_1y2m,
           o_orderdate - INTERVAL '3 months'                       AS minus_3m,
           CAST(epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01 00:00:00')
                AS BIGINT)                                         AS dt_total_secs
    FROM orders WHERE o_orderkey % 5 = 0
    """,
    tags=("functions", "types"),
)
def func_interval_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL YEAR TO MONTH / DAY TO SECOND parity
    (YearMonthIntervalType.java, DayTimeIntervalType.java): timestamp
    difference as day-time interval (EXTRACT DAY), make_dt_interval /
    make_ym_interval arithmetic incl. month-end clamping, and total
    months/seconds as the integer encodings Flink uses internally."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 5 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (
            (F.year(d) * 12 + F.month(d)).cast("bigint") - (1995 * 12 + 1)
        ).alias("months_since"),
        F.expr(
            "CAST(extract(DAY FROM (o_orderdate - TIMESTAMP '1995-01-01 00:00:00')) AS BIGINT)"
        ).alias("dt_interval_days"),
        (d + F.expr("make_dt_interval(0, 36, 0, 0)")).alias("plus_36h"),
        (d - F.expr("make_dt_interval(0, 0, 90, 0)")).alias("minus_90m"),
        (d + F.expr("make_ym_interval(1, 2)")).alias("plus_1y2m"),
        (d - F.expr("make_ym_interval(0, 3)")).alias("minus_3m"),
        (
            F.unix_timestamp(d)
            - F.unix_timestamp(F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .cast("bigint")
        .alias("dt_total_secs"),
    )


@query(
    "func_string_slice_bytes",
    oracle="""
    SELECT n_nationkey,
           left(n_name, 3)                       AS v_left,
           right(n_name, 3)                      AS v_right,
           CAST(position('A' IN n_name) AS BIGINT)        AS v_pos,
           CAST(octet_length(encode(n_name)) AS BIGINT)   AS v_octet,
           CAST(bit_length(n_name) AS BIGINT)             AS v_bitlen,
           translate(n_name, 'AEI', 'aei')       AS v_translate,
           hex(encode(n_name))                   AS v_bytes_hex,
           CAST(n_nationkey AS VARCHAR)          AS v_str
    FROM nation
    """,
    tags=("functions", "string"),
)
def func_string_slice_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String slicing + byte functions (BuiltInFunctionDefinitions
    left/right :SqlFunctionUtils, position, octet/bit length, translate,
    encode) — the stragglers of §2.11's string block."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.expr("left(n_name, 3)").alias("v_left"),
        F.expr("right(n_name, 3)").alias("v_right"),
        F.expr("position('A' IN n_name)").cast("bigint").alias("v_pos"),
        F.octet_length("n_name").cast("bigint").alias("v_octet"),
        F.bit_length("n_name").cast("bigint").alias("v_bitlen"),
        F.translate("n_name", "AEI", "aei").alias("v_translate"),
        F.hex(F.encode("n_name", "UTF-8")).alias("v_bytes_hex"),
        F.col("n_nationkey").cast("string").alias("v_str"),
    )
