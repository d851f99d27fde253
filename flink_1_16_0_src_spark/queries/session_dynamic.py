"""Dynamic-gap session windows (SURVEY.md §2.9).

Reference: DataStream dynamic session gaps
(DS/api/windowing/assigners/DynamicEventTimeSessionWindows.java — gap
extracted per element) and SQL SESSION windows
(SessionWindowAssigner.java:36). Spark's ``session_window`` accepts a
Column gap expression (dynamic per row) natively; the oracle rebuilds
the same merging-session semantics with gaps-and-islands SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load

# per-event-type gap: errors close sessions fast, purchases linger
_GAP_SQL = "CASE WHEN event_type = 'error' THEN 2 WHEN event_type = 'purchase' THEN 15 ELSE 5 END"


@query(
    "tvf_session_dynamic_gap",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts > lag(ts) OVER w
                       + to_minutes(({_GAP_SQL.replace("event_type", "lag(event_type) OVER w")})::BIGINT)
                  OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("window-tvf", "session"),
)
def tvf_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION window with per-row gap expression: the gap after an
    event depends on its type. Spark's session_window(ts, gap_col)
    implements exactly the reference's dynamic-gap merging assigner:
    a session extends while next.ts <= prev.ts + gap(prev)."""
    ev = load(spark, sf_dir, "events")
    gap = F.expr(
        "CASE WHEN event_type = 'error' THEN '2 minutes' "
        "WHEN event_type = 'purchase' THEN '15 minutes' ELSE '5 minutes' END"
    )
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
