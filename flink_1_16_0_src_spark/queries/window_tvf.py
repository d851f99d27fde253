"""Window TVF family (SURVEY.md §2.3 group-window/TVF aggs, §2.9 TVF).

Reference parity: TUMBLE/HOP/CUMULATE table functions
(SqlTumbleTableFunction.java:37, SqlHopTableFunction.java:38,
SqlCumulateTableFunction.java:37; runtime SlicingWindowOperator.java:101)
and SESSION group windows (SessionWindowAssigner.java:36). Batch form
here (the driver oracle is batch SQL); the same helpers drive the
streaming variants in streaming/.

DuckDB oracle notes: tumble = time_bucket; hop/cumulate = explicit
slice generation via generate_series (the same fan-out our operator
does); session = gaps-and-islands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.operators.windows import cumulate, hop, session, tumble
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "tvf_tumble_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window-tvf",),
)
def tvf_tumble_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE window TVF aggregation (SqlTumbleTableFunction.java:37; window() builtin)."""
    ev = tumble(load(spark, sf_dir, "events"), "ts", "1 hour")
    return ev.groupBy("window_start", "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@query(
    "tvf_tumble_offset_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '15 minutes') AS window_start,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    """,
    tags=("window-tvf",),
)
def tvf_tumble_offset_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE with a window OFFSET (SqlTumbleTableFunction.java:37
    optional third operand; TumblingWindowAssigner.withOffset): hourly
    windows shifted to :15 boundaries via window()'s startTime."""
    ev = tumble(load(spark, sf_dir, "events"), "ts", "1 hour", offset="15 minutes")
    return ev.groupBy("window_start").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@query(
    "tvf_hop_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', e.ts) - (j.j * INTERVAL '10 minutes') AS window_start,
           count(*) AS n,
           round(sum(e.value), 2) AS sum_value
    FROM events e, generate_series(0, 2) j(j)
    GROUP BY 1
    """,
    tags=("window-tvf",),
)
def tvf_hop_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP(size 30min, slide 10min): every row lands in size/slide = 3
    windows (oracle generates the same 3 offsets explicitly)."""
    ev = hop(load(spark, sf_dir, "events"), "ts", "10 minutes", "30 minutes")
    return ev.groupBy("window_start").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@query(
    "tvf_cumulate_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', e.ts) AS window_start,
           time_bucket(INTERVAL '1 hour', e.ts) + (k.k * INTERVAL '15 minutes') AS window_end,
           count(*) AS n,
           round(sum(e.value), 2) AS sum_value
    FROM events e, generate_series(1, 4) k(k)
    WHERE time_bucket(INTERVAL '1 hour', e.ts) + (k.k * INTERVAL '15 minutes') > e.ts
    GROUP BY 1, 2
    """,
    tags=("window-tvf", "custom-op"),
)
def tvf_cumulate_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE(step 15min, max 1h) — the custom slice-explode operator
    (no Spark builtin; reference SliceAssigners.java:94)."""
    ev = cumulate(load(spark, sf_dir, "events"), "ts", "15 minutes", "1 hour")
    return ev.groupBy("window_start", "window_end").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@query(
    "tvf_session_agg",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '2 hours' OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS window_start,
           max(ts) + INTERVAL '2 hours' AS window_end,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("window-tvf", "session"),
)
def tvf_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION windows, 2h gap per user (reference
    SessionWindowAssigner.java:36) — Spark builtin session_window;
    oracle = gaps-and-islands. session_window end = last_ts + gap."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "2 hours").alias("w"), "user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "sum_value",
        )
    )


@query(
    "tvf_session_rows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '2 hours' OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, event_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, event_id,
           min(ts) OVER (PARTITION BY user_id, session_id) AS window_start,
           max(ts) OVER (PARTITION BY user_id, session_id) + INTERVAL '2 hours' AS window_end
    FROM sessions
    """,
    tags=("window-tvf", "session", "custom-op"),
)
def tvf_session_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session TVF row-assignment form (window cols appended per row,
    like Flink's WindowTableFunctionOperator) — custom gaps-and-islands
    operator operators.windows.session.

    NOTE: ties on (user_id, ts) are fine — both sides treat equal ts as
    the same session (gap > 0)."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return session(ev, "ts", "2 hours", "user_id").select(
        "user_id", "event_id", "window_start", "window_end"
    )


@query(
    "rollup_hypertable_multires",
    oracle="""
    WITH lv AS (
      SELECT '1 hour' AS resolution, date_trunc('hour', ts) AS bucket_start,
             event_type, count("value") AS cnt,
             sum("value") AS raw_total,
             round(min("value"), 4) AS vmin, round(max("value"), 4) AS vmax
      FROM events GROUP BY 2, 3
      UNION ALL
      SELECT '1 day', date_trunc('day', ts), event_type, count("value"),
             sum("value"), round(min("value"), 4), round(max("value"), 4)
      FROM events GROUP BY 2, 3
    )
    SELECT resolution, bucket_start, event_type, cnt,
           round(raw_total, 2) AS total, vmin, vmax,
           round(raw_total / cnt, 4) AS avg_v
    FROM lv
    """,
    tags=("rollup", "window-tvf", "custom-op"),
)
def rollup_hypertable_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup: hour + day resolutions, the day level
    re-aggregated FROM the hour level (one raw scan total). The oracle
    recomputes both levels from raw — equality proves re-aggregation
    is lossless."""
    from flink_1_16_0_src_spark.operators.rollup import hypertable_rollup

    ev = load(spark, sf_dir, "events")
    out = hypertable_rollup(
        ev, "ts", ["event_type"], "value", resolutions=["1 hour", "1 day"]
    )
    return out.select(
        "resolution",
        "bucket_start",
        "event_type",
        "cnt",
        F.round("total", 2).alias("total"),
        F.round("vmin", 4).alias("vmin"),
        F.round("vmax", 4).alias("vmax"),
        F.round(F.col("total") / F.col("cnt"), 4).alias("avg_v"),
    )


@query(
    "tvf_tumble_grouping_sets",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY GROUPING SETS
      ((time_bucket(INTERVAL '1 hour', ts), event_type),
       (time_bucket(INTERVAL '1 hour', ts)))
    """,
    tags=("window-tvf", "grouping-sets"),
)
def tvf_tumble_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window aggregation with GROUPING SETS (window-agg.md:120-124:
    supported since 1.16; window_start/window_end must sit in GROUP BY
    outside the sets): per-window totals at both the (window,
    event_type) and (window) granularities in ONE pass — Spark's
    Expand operator under the tumbled frame, identical plan family to
    plain GROUPING SETS."""
    ev = tumble(load(spark, sf_dir, "events"), "ts", "1 hour")
    v = "tvf_gs_events"
    ev.createOrReplaceTempView(v)
    return spark.sql(
        f"""
        SELECT window_start, event_type, count(*) AS n,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS sum_cents
        FROM {v}
        GROUP BY GROUPING SETS ((window_start, event_type), (window_start))
        """
    )


@query(
    "tvf_window_time_cascade",
    oracle="""
    WITH m AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS ws,
             count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT time_bucket(INTERVAL '1 hour',
             ws + INTERVAL '10 minutes' - INTERVAL '1 millisecond') AS window_start,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_slices
    FROM m GROUP BY 1
    """,
    tags=("window-tvf",),
)
def tvf_window_time_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading window aggregation (window-agg.md "Cascading Window
    Aggregation"): the 10-minute TVF aggregate keeps its window_time
    (= window_end − 1 ms, TimeWindow.maxTimestamp — the third TVF
    column), and the hour-level TUMBLE windows ON that rowtime
    attribute. The oracle rebuilds window_time arithmetically."""
    ev = tumble(load(spark, sf_dir, "events"), "ts", "10 minutes")
    minute = ev.groupBy("window_start", "window_end", "window_time").agg(
        F.count("*").alias("n")
    )
    hour = tumble(minute, "window_time", "1 hour")
    return hour.groupBy(F.col("window_start")).agg(
        F.sum("n").alias("n_events"), F.count("*").alias("n_slices")
    )
