"""MATCH_RECOGNIZE / CEP queries (SURVEY.md §2.8).

Reference: StreamExecMatch.java:59, MatchCodeGenerator.scala, CEP NFA
NFA.java:86. The quantifier-free adjacent-pair pattern with AFTER MATCH
SKIP TO NEXT ROW is exactly a lead() rewrite — that gives the DuckDB
oracle. The greedy A+ B pattern has no ANSI-SQL equivalent, so it is
registered rows-only (the driver records the weaker check; SURVEY.md
§5 layer 3).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from flink_1_16_0_src_spark import tables
from flink_1_16_0_src_spark.operators import cep
from flink_1_16_0_src_spark.registry import query

_PAIR_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("click_id", LongType()),
        StructField("purchase_id", LongType()),
        StructField("purchase_value", DoubleType()),
    ]
)

_PAIR_STEPS = [
    cep.Step("A", lambda r, m: r["event_type"] == "click",
             vec=lambda pdf: (pdf["event_type"] == "click").to_numpy(),
             expr="event_type = 'click'"),
    cep.Step("B", lambda r, m: r["event_type"] == "purchase",
             vec=lambda pdf: (pdf["event_type"] == "purchase").to_numpy(),
             expr="event_type = 'purchase'"),
]

_PAIR_MEASURES = {
    "click_id": lambda m: cep.first(m, "A", "event_id"),
    "purchase_id": lambda m: cep.first(m, "B", "event_id"),
    "purchase_value": lambda m: cep.first(m, "B", "value"),
}


@query(
    "cep_adjacent_click_purchase",
    oracle="""
    SELECT user_id, click_id, purchase_id, purchase_value FROM (
      SELECT user_id,
             event_id AS click_id,
             lead(event_id) OVER w AS purchase_id,
             event_type,
             lead(event_type) OVER w AS next_type,
             lead(value) OVER w AS purchase_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) t
    WHERE event_type = 'click' AND next_type = 'purchase'
    """,
    tags=("cep", "match-recognize"),
)
def cep_adjacent_click_purchase(spark: SparkSession, sf_dir: str):
    """PATTERN (A B) quantifier-free, AFTER MATCH SKIP TO NEXT ROW —
    every click immediately followed (strict contiguity per user) by a
    purchase. The declarative measures + SQL DEFINEs let
    match_recognize COMPILE this to a lead()-window Catalyst plan
    (zero Python); the DuckDB oracle is the same rewrite, so the
    compiled plan and the NFA are cross-checked in test_cep.py."""
    ev = tables.load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type", "value")
    return cep.match_recognize(
        ev,
        ["user_id"],
        ["ts", "event_id"],
        _PAIR_STEPS,
        _PAIR_MEASURES,
        _PAIR_SCHEMA,
        after_match="to_next_row",
        measures_cols={
            "click_id": ("A", "event_id"),
            "purchase_id": ("B", "event_id"),
            "purchase_value": ("B", "value"),
        },
    )


_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
        StructField("n_clicks", IntegerType()),
        StructField("purchase_value", DoubleType()),
    ]
)

_SESSION_STEPS = [
    cep.Step.plus("A", lambda r, m: r["event_type"] == "click",
                  vec=lambda pdf: (pdf["event_type"] == "click").to_numpy()),
    cep.Step("B", lambda r, m: r["event_type"] == "purchase",
             vec=lambda pdf: (pdf["event_type"] == "purchase").to_numpy()),
]

_SESSION_MEASURES = {
    "start_ts": lambda m: cep.first(m, "A", "ts"),
    "end_ts": lambda m: cep.last(m, "B", "ts"),
    "n_clicks": lambda m: cep.count_of(m, "A"),
    "purchase_value": lambda m: cep.last(m, "B", "value"),
}


@query(
    "cep_clicks_then_purchase",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    marked AS (
      SELECT *,
             coalesce(max(CASE WHEN event_type <> 'click' THEN rn END)
                        OVER (PARTITION BY user_id ORDER BY rn
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS prev_nonclick_rn
      FROM ordered
    )
    SELECT p.user_id,
           s.ts AS start_ts,
           p.ts AS end_ts,
           CAST(p.rn - 1 - p.prev_nonclick_rn AS INT) AS n_clicks,
           p.value AS purchase_value
    FROM marked p
    JOIN marked s
      ON s.user_id = p.user_id AND s.rn = p.prev_nonclick_rn + 1
    WHERE p.event_type = 'purchase' AND p.rn - 1 > p.prev_nonclick_rn
    """,
    tags=("cep", "match-recognize"),
)
def cep_clicks_then_purchase(spark: SparkSession, sf_dir: str):
    """PATTERN (A+ B): maximal run of clicks ending in a purchase,
    AFTER MATCH SKIP PAST LAST ROW (MatchCodeGenerator.scala;
    NFACompiler greedy plus-quantifier). VERDICT r6 #3: the greedy A+
    with strict contiguity IS SQL-expressible after all, via
    gaps-and-islands — a match is exactly a maximal consecutive click
    run (per user, ordered by ts, event_id) whose immediate successor
    row is a purchase; SKIP PAST LAST ROW disjointness is automatic
    because the purchase row itself breaks the next run. The oracle
    computes each row's previous non-click row-number and keeps
    purchases with at least one click strictly between."""
    ev = tables.load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type", "value")
    return cep.match_recognize(
        ev, ["user_id"], ["ts", "event_id"], _SESSION_STEPS, _SESSION_MEASURES, _SESSION_SCHEMA
    )


_FB_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("click_id", LongType()),
        StructField("purchase_id", LongType()),
    ]
)


@query(
    "cep_followed_by",
    oracle="""
    SELECT user_id, event_id AS click_id, next_purchase_id AS purchase_id FROM (
      SELECT user_id, event_id, event_type,
             first_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_id
      FROM events
    ) t
    WHERE event_type = 'click' AND next_purchase_id IS NOT NULL
    """,
    tags=("cep", "pattern-api"),
)
def cep_followed_by(spark: SparkSession, sf_dir: str):
    """Pattern API relaxed contiguity (Pattern.followedBy,
    flink-cep Pattern.java; NFA SKIP_TILL_NEXT): each click matched to
    the EARLIEST later purchase in its user partition, intervening
    events skipped. AFTER MATCH SKIP TO NEXT ROW makes every click an
    anchor, which is exactly the ignore-nulls first_value window the
    DuckDB oracle computes."""
    ev = tables.load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pat = (
        cep.Pattern.begin("A")
        .where(lambda r, m: r["event_type"] == "click",
               vec=lambda pdf: (pdf["event_type"] == "click").to_numpy())
        .followed_by("B")
        .where(lambda r, m: r["event_type"] == "purchase",
               vec=lambda pdf: (pdf["event_type"] == "purchase").to_numpy())
    )
    return cep.CEP.pattern(ev, pat, ["user_id"], ["ts", "event_id"]).select(
        {
            "click_id": lambda m: cep.first(m, "A", "event_id"),
            "purchase_id": lambda m: cep.first(m, "B", "event_id"),
        },
        _FB_SCHEMA,
        after_match="to_next_row",
    )


_UNTIL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_ts", TimestampType()),
        StructField("n_clicks", IntegerType()),
        StructField("purchase_id", LongType()),
        StructField("purchase_value", DoubleType()),
    ]
)


@query(
    "cep_until_stop",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    seg AS (
      SELECT *,
             coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg_id
      FROM ordered
    ),
    g AS (
      SELECT user_id, seg_id,
             min(CASE WHEN event_type = 'click' THEN ts END) AS start_ts,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INT) AS n_clicks,
             max(CASE WHEN event_type = 'purchase' THEN event_id END) AS purchase_id,
             max(CASE WHEN event_type = 'purchase' THEN value END) AS purchase_value
      FROM seg GROUP BY user_id, seg_id
    )
    SELECT user_id, start_ts, n_clicks, purchase_id, purchase_value
    FROM g WHERE n_clicks > 0 AND purchase_id IS NOT NULL
    """,
    tags=("cep", "pattern-api"),
)
def cep_until_stop(spark: SparkSession, sf_dir: str):
    """Pattern.until() (flink-cep Pattern.java:228, VERDICT r7 #5):
    collect a user's clicks with gap-skipping (oneOrMore + allowGaps =
    Flink's default relaxed loop) UNTIL the first purchase — the stop
    row is not consumed — then match that purchase as B. Without the
    stop condition the greedy gap-skipping loop would swallow purchases
    as gap rows and keep taking later clicks; until() is what bounds
    the loop at the segment boundary. Oracle: rows segment at each
    purchase (running purchase count over preceding rows); every
    segment with >=1 click and a purchase emits (first click ts, click
    count, the purchase) — exactly the skip-past-last-row match set."""
    ev = tables.load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    pat = (
        cep.Pattern.begin("A")
        .where(lambda r, m: r["event_type"] == "click")
        .one_or_more()
        .allow_gaps()
        .until(lambda r, m: r["event_type"] == "purchase")
        .followed_by("B")
        .where(lambda r, m: r["event_type"] == "purchase")
    )
    return cep.CEP.pattern(ev, pat, ["user_id"], ["ts", "event_id"]).select(
        {
            "start_ts": lambda m: cep.first(m, "A", "ts"),
            "n_clicks": lambda m: cep.count_of(m, "A"),
            "purchase_id": lambda m: cep.first(m, "B", "event_id"),
            "purchase_value": lambda m: cep.first(m, "B", "value"),
        },
        _UNTIL_SCHEMA,
    )
