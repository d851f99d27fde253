"""Streaming-drain queries: the driver contract's window into
Structured Streaming execution.

Each query opens the fixture as a FILE STREAM (availableNow trigger),
runs a streaming operator graph, drains it into a memory sink, and
returns the emitted rows as a batch DataFrame — so the driver's oracle
comparison and the benchmark both exercise the real streaming path
(micro-batch planner, watermark bookkeeping, stateful agg), not a batch
rewrite. Oracle: append-mode emission = windows whose end <= final
watermark (max(ts) - delay), computable in plain SQL.

Reference parity: SURVEY.md §5.4 — the reference's streaming ITCases
drain a bounded stream and compare against batch SQL the same way;
bench M7 calls for a streaming-throughput headline number.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.streaming import sources as ssrc
from flink_1_16_0_src_spark.streaming import windows as swin

_seq = itertools.count()


@query(
    "stream_tumble_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    agg AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             event_type,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2, 3
    )
    SELECT window_start, window_end, event_type, n, sum_value
    FROM agg, wm WHERE agg.window_end <= wm.w
    """,
    tags=("streaming", "window"),
)
def stream_tumble_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream → watermark(10 min) → TUMBLE(1 hour) agg → append
    emission, drained with availableNow. Emitted set = windows closed
    by the final watermark — exactly the oracle's wm filter. This is
    the end-to-end streaming throughput representative (bench M7):
    source listing, micro-batch planning, state-store windowed agg,
    and sink commit are all on the timed path."""
    sdf = ssrc.stream_table(spark, sf_dir, "events", watermark=("ts", "10 minutes"))
    out = swin.tumble_agg(
        sdf, "ts", "1 hour", ["event_type"],
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    drained = ssrc.run_to_memory(out, f"drain_tumble_{next(_seq)}", "append")
    return drained.select("window_start", "window_end", "event_type", "n", "sum_value")


@query(
    "stream_hop_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    agg AS (
      SELECT time_bucket(INTERVAL '20 minutes', e.ts) - (j.j * INTERVAL '20 minutes') AS window_start,
             time_bucket(INTERVAL '20 minutes', e.ts) - (j.j * INTERVAL '20 minutes')
               + INTERVAL '1 hour' AS window_end,
             count(*) AS n
      FROM events e, generate_series(0, 2) j(j)
      GROUP BY 1, 2
    )
    SELECT window_start, window_end, n
    FROM agg, wm WHERE agg.window_end <= wm.w
    """,
    tags=("streaming", "window"),
)
def stream_hop_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HOP (slide 20min, size 1h → 3 windows/row) drained in
    append mode; emitted = hop windows closed by the final watermark
    (oracle generates the 3 per-row slide offsets explicitly)."""
    sdf = ssrc.stream_table(spark, sf_dir, "events", watermark=("ts", "10 minutes"))
    out = swin.hop_agg(sdf, "ts", "20 minutes", "1 hour", [], F.count("*").alias("n"))
    drained = ssrc.run_to_memory(out, f"drain_hop_{next(_seq)}", "append")
    return drained.select("window_start", "window_end", "n")


@query(
    "stream_session_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    flagged AS (
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
    ), agg AS (
      SELECT user_id,
             min(ts) AS window_start,
             max(ts) + INTERVAL '2 hours' AS window_end,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM sessions
      GROUP BY user_id, session_id
    )
    SELECT user_id, window_start, window_end, n, sum_value
    FROM agg, wm WHERE agg.window_end <= wm.w
    """,
    tags=("streaming", "session"),
)
def stream_session_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSION windows (2h gap per user, merging assigner)
    drained in append mode: emitted = sessions whose end (last event +
    gap) the final watermark passed — the reference's session-window
    GC condition (SessionWindowAssigner + cleanup timer)."""
    sdf = ssrc.stream_table(spark, sf_dir, "events", watermark=("ts", "10 minutes"))
    out = swin.session_agg(
        sdf, "ts", "2 hours", ["user_id"],
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"),
    )
    drained = ssrc.run_to_memory(out, f"drain_session_{next(_seq)}", "append")
    return drained.select("user_id", "window_start", "window_end", "n", "sum_value")


@query(
    "stream_cumulate_drain",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', e.ts) AS window_start,
           time_bucket(INTERVAL '1 hour', e.ts) + (k.k * INTERVAL '20 minutes') AS window_end,
           count(*) AS n
    FROM events e, generate_series(1, 3) k(k)
    WHERE time_bucket(INTERVAL '1 hour', e.ts) + (k.k * INTERVAL '20 minutes') > e.ts
    GROUP BY 1, 2
    """,
    tags=("streaming", "window-tvf", "custom-op"),
)
def stream_cumulate_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUMULATE (step 20min, max 1h — the custom slice-explode
    operator) drained in UPDATE mode with a single availableNow batch:
    the memory sink then holds exactly the final value of every slice,
    which equals the batch CUMULATE (the oracle). Evidence that the
    slice-explode operator runs under the micro-batch planner, not just
    in batch mode."""
    sdf = ssrc.stream_table(spark, sf_dir, "events")
    out = swin.cumulate_agg(sdf, "ts", "20 minutes", "1 hour", [], F.count("*").alias("n"))
    drained = ssrc.run_to_memory(out, f"drain_cumulate_{next(_seq)}", "update")
    return drained.select("window_start", "window_end", "n")


@query(
    "stream_topn_drain",
    oracle="""
    SELECT user_id, event_id, value, CAST(rk AS INT) AS rank_num FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rk
      FROM events
    ) t WHERE rk <= 3
    """,
    tags=("streaming", "stateful", "topn"),
)
def stream_topn_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom continuous Top-N (stateful.streaming_topn, the
    AppendOnlyTopNFunction analog) drained with one availableNow batch:
    the update-mode sink then holds the FINAL top-3 per key, which a
    row_number window reproduces. Ordered by event_id (unique) so the
    ranking is deterministic."""
    from flink_1_16_0_src_spark.streaming.stateful import streaming_topn

    sdf = ssrc.stream_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    out = streaming_topn(sdf, ["user_id"], "event_id", 3, descending=True)
    drained = ssrc.run_to_memory(out, f"drain_topn_{next(_seq)}", "update")
    return drained.select("user_id", "event_id", "value", "rank_num")


@query(
    "stream_keep_last_drain",
    oracle="""
    SELECT user_id, event_type, ts, value FROM (
      SELECT user_id, event_type, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC) AS rk
      FROM events
    ) t WHERE rk = 1
    """,
    tags=("streaming", "stateful", "dedup"),
)
def stream_keep_last_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom keep-last deduplicate (stateful.keep_last_dedup — the
    rowtime DeduplicateKeepLastRowFunction analog), order_col=ts:
    after the availableNow drain the update-mode sink holds the
    max-ts row per (user_id, event_type). The fixture has no
    (user, type, ts) ties at any SF, so the result is deterministic."""
    from flink_1_16_0_src_spark.streaming.stateful import keep_last_dedup

    sdf = ssrc.stream_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    out = keep_last_dedup(sdf, ["user_id", "event_type"], order_col="ts")
    drained = ssrc.run_to_memory(out, f"drain_keeplast_{next(_seq)}", "update")
    return drained.select("user_id", "event_type", "ts", "value")


@query(
    "stream_interval_join_drain",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
           round(p.value, 2) AS purchase_value
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.ts >= c.ts - INTERVAL '5 minutes'
     AND p.ts <= c.ts + INTERVAL '5 minutes'
    """,
    tags=("streaming", "join"),
)
def stream_interval_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming interval join (both sides watermarked, append mode —
    IntervalJoinOperator parity): purchases joined to clicks of the
    same user within ±5 minutes. After the availableNow drain every
    in-window pair has been emitted, so the result equals the batch
    range join the oracle computes."""
    from flink_1_16_0_src_spark.streaming import joins as sjoins

    l = ssrc.stream_table(spark, sf_dir, "events", watermark=("ts", "10 minutes"))
    r = ssrc.stream_table(spark, sf_dir, "events", watermark=("ts", "10 minutes"))
    lf = l.where(F.col("event_type") == "purchase").select(
        "ts", "user_id", F.col("event_id").alias("purchase_id"), "value"
    )
    rf = r.where(F.col("event_type") == "click").select(
        F.col("ts").alias("rts"),
        F.col("user_id").alias("ruid"),
        F.col("event_id").alias("click_id"),
    )
    out = sjoins.interval_join(
        lf, rf, ("user_id", "ruid"), ("ts", "rts"), "5 minutes", "5 minutes"
    ).select(
        "user_id", "purchase_id", "click_id",
        F.round("value", 2).alias("purchase_value"),
    )
    drained = ssrc.run_to_memory(out, f"drain_ijoin_{next(_seq)}", "append")
    return drained


@query(
    "stream_window_join_drain",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND time_bucket(INTERVAL '30 minutes', p.ts) = time_bucket(INTERVAL '30 minutes', c.ts)
     AND p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    tags=("streaming", "join", "window"),
)
def stream_window_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming WINDOW join (StreamExecWindowJoin: rows co-located in
    the same tumbling window AND key), both sides watermarked, append
    mode: after the drain every same-window pair has been emitted, so
    the result equals the batch window-bucket equi-join the oracle
    computes."""
    from flink_1_16_0_src_spark.streaming import joins as sjoins

    l = ssrc.stream_table(spark, sf_dir, "events", watermark=("ts", "10 minutes"))
    r = ssrc.stream_table(spark, sf_dir, "events", watermark=("ts", "10 minutes"))
    lf = l.where(F.col("event_type") == "purchase").select(
        "ts", "user_id", F.col("event_id").alias("purchase_id")
    )
    rf = r.where(F.col("event_type") == "click").select(
        F.col("ts").alias("rts"),
        F.col("user_id").alias("ruid"),
        F.col("event_id").alias("click_id"),
    )
    out = sjoins.window_join(
        lf, rf, ("ts", "rts"), "30 minutes", ("user_id", "ruid")
    ).select(lf["user_id"], "purchase_id", "click_id")
    return ssrc.run_to_memory(out, f"drain_wjoin_{next(_seq)}", "append")


@query(
    "stream_over_drain",
    oracle="""
    SELECT user_id, event_id,
           CAST(cnt AS BIGINT) AS running_cnt,
           round(s, 2) AS running_sum,
           round(mn, 2) AS running_min,
           round(mx, 2) AS running_max
    FROM (
      SELECT user_id, event_id,
             count(*) OVER w AS cnt,
             sum(value) OVER w AS s,
             min(value) OVER w AS mn,
             max(value) OVER w AS mx
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ) t
    """,
    tags=("streaming", "stateful", "over"),
)
def stream_over_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom streaming OVER aggregate (stateful.streaming_over_unbounded
    — the reference's unbounded-preceding proctime OVER function)
    drained in one availableNow batch: rows process in order_col order,
    so every emitted row carries exactly the SQL running-window values.
    Ordered by the unique event_id for determinism."""
    from flink_1_16_0_src_spark.streaming.stateful import streaming_over_unbounded

    sdf = ssrc.stream_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    out = streaming_over_unbounded(sdf, ["user_id"], "event_id", "value")
    drained = ssrc.run_to_memory(out, f"drain_over_{next(_seq)}", "append")
    return drained.select(
        "user_id", "event_id", "running_cnt",
        F.round("running_sum", 2).alias("running_sum"),
        F.round("running_min", 2).alias("running_min"),
        F.round("running_max", 2).alias("running_max"),
    )


@query(
    "stream_changelog_drain",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, value,
             lag(ts) OVER w AS pts,
             lag(value) OVER w AS pv,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts)
    )
    SELECT user_id, event_type, ts, value, '+I' AS rowkind FROM seq WHERE rn = 1
    UNION ALL
    SELECT user_id, event_type, pts, pv, '-U' FROM seq WHERE rn > 1 AND value <> pv
    UNION ALL
    SELECT user_id, event_type, ts, value, '+U' FROM seq WHERE rn > 1 AND value <> pv
    """,
    tags=("streaming", "stateful", "changelog"),
)
def stream_changelog_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog normalize (stateful.changelog_normalize — the
    reference's ChangelogNormalize + RowKind stamping) drained in one
    availableNow batch: the full +I / -U / +U transition stream per
    (user, event_type) keyed by ts order, which a lag() reconstruction
    reproduces exactly in SQL (the -U rows carry the PREVIOUS image,
    RowKind.UPDATE_BEFORE semantics)."""
    from flink_1_16_0_src_spark.streaming.stateful import changelog_normalize

    sdf = ssrc.stream_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    out = changelog_normalize(sdf, ["user_id", "event_type"], order_col="ts")
    drained = ssrc.run_to_memory(out, f"drain_changelog_{next(_seq)}", "append")
    return drained.select(
        "user_id", "event_type", "ts", "value",
        F.col("__rowkind").alias("rowkind"),
    )


@query(
    "stream_asof_drain",
    oracle="""
    SELECT e.user_id AS custkey, e.event_id,
           epoch_us(e.ts) AS ts_us,
           o.o_orderkey, round(o.o_totalprice, 2) AS last_order_price
    FROM events e
    ASOF LEFT JOIN (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                   ORDER BY o_orderkey DESC) = 1
    ) o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("streaming", "stateful", "temporal"),
)
def stream_asof_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING temporal/as-of join (stateful.streaming_asof_join —
    TemporalRowTimeJoinOperator parity: right-side version list in
    keyed state, bisect per left row) drained in one batch: every
    event joined to the user's latest order version at event time,
    equal to DuckDB's native ASOF LEFT JOIN. The version stream is
    deduplicated to one row per (customer, date) so version-timestamp
    ties cannot make the kept payload order-dependent."""
    from pyspark.sql import Window as W

    from flink_1_16_0_src_spark.streaming.stateful import streaming_asof_join
    from flink_1_16_0_src_spark.tables import load

    # event time rides the payload as unix micros — the JSON state
    # round-trip keeps only millisecond precision for raw timestamps
    ev = ssrc.stream_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey"), "ts", "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    w = W.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    o = (
        o.withColumn("__rn", F.row_number().over(w)).where("__rn = 1").drop("__rn")
        .withColumnRenamed("o_custkey", "custkey")
        .withColumn("rts", F.col("o_orderdate").cast("timestamp"))
    )
    # version side as a stream too: re-read through a temp parquet is
    # unnecessary — the operator only needs both sides tagged; feed the
    # bounded version table as a one-batch stream via the same fixture
    r = ssrc.stream_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("timestamp").alias("rts"),
        "o_orderkey", "o_totalprice",
    )
    rw = W.partitionBy("custkey", "rts").orderBy(F.col("o_orderkey").desc())
    # dedupe must happen streaming-side: keep max orderkey per version ts
    # is not expressible pre-shuffle here, so filter AFTER via the known
    # deterministic rule inside the oracle instead — both sides keep all
    # versions and ties resolve identically by the bisect picking the
    # LAST-sorted (insertion after sort by ts is stable, so equal-ts
    # versions keep arrival order)... to stay deterministic, pre-dedupe
    # with a batch-computed key set is required; simplest: restrict to
    # orders that are the per-(cust, date) max orderkey.
    # materialize the batch-computed key set ONCE (r13 stream-scan
    # audit: this drain was the only >2-source-scan plan — the argmax
    # subtree re-scanned orders per micro-batch on top of the version
    # stream's own scan; the dim is static for the drain's lifetime, so
    # the checkpointed (cust, rts, orderkey) keys are reused by every
    # batch's broadcast)
    keep = o.select("custkey", "rts", "o_orderkey").localCheckpoint(eager=False)
    r = r.join(F.broadcast(keep), ["custkey", "rts", "o_orderkey"], "left_semi")
    out = streaming_asof_join(ev, r, "custkey", "ts", "rts", ["o_orderkey", "o_totalprice"])
    drained = ssrc.run_to_memory(out, f"drain_asof_{next(_seq)}", "append")
    return drained.select(
        "custkey", "event_id", "ts_us", "o_orderkey",
        F.round("o_totalprice", 2).alias("last_order_price"),
    )


@query(
    "stream_unbounded_join_drain",
    oracle="""
    SELECT p.user_id AS uid, p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    tags=("streaming", "join", "changelog"),
)
def stream_unbounded_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNBOUNDED stream-stream inner join (the custom dual-keyed-buffer
    StreamingJoinOperator analog, no time bound) drained in one batch:
    the inner changelog is append-only (+I per pairing), so the drained
    set equals the batch equi-join — the hardest stateful join gets a
    driver-checkable value row."""
    from flink_1_16_0_src_spark.streaming.joins import unbounded_join

    l = ssrc.stream_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(F.col("user_id").alias("uid"), F.col("event_id").alias("purchase_id"))
    r = ssrc.stream_table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    ).select(F.col("user_id").alias("ruid"), F.col("event_id").alias("click_id"))
    out = unbounded_join(l, r, ("uid", "ruid"), how="inner")
    drained = ssrc.run_to_memory(out, f"drain_ujoin_{next(_seq)}", "append")
    return drained.select("uid", "purchase_id", "click_id")


@query(
    "stream_cep_any_drain",
    oracle="""
    SELECT a.user_id,
           a.event_id AS click_id,
           b.event_id AS purchase_id,
           round(b.value, 2) AS purchase_value
    FROM events a JOIN events b ON a.user_id = b.user_id
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
      AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
      AND b.ts - a.ts <= INTERVAL '2 hours'
    """,
    tags=("streaming", "cep", "followed-by-any"),
)
def stream_cep_any_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING followedByAny (SKIP_TILL_ANY) drained end-to-end: every
    (click, any later purchase within 2h) pair per user emits its own
    match — all-pairs semantics, which is exactly a self-join in SQL,
    so the oracle is the interval self-join. Exercises the windowed
    all-anchors re-enumeration + emitted-fingerprint state path
    (operators/cep._match_recognize_stream_any). "Later" is the
    deterministic buffer order (ts, event_id) — secondary_order makes
    same-timestamp pairs arrival-independent, and the oracle's
    inequality mirrors that exact tie rule (ADVICE r3; current
    fixtures have 0 per-user ts ties, so this pins semantics rather
    than changing values)."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from flink_1_16_0_src_spark.operators import cep

    sdf = ssrc.stream_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    steps = [
        cep.Step("A", lambda r, m: r["event_type"] == "click"),
        cep.Step("B", lambda r, m: r["event_type"] == "purchase", contiguity="relaxed_any"),
    ]
    measures = {
        "click_id": lambda m: cep.first(m, "A", "event_id"),
        "purchase_id": lambda m: cep.first(m, "B", "event_id"),
        "purchase_value": lambda m: round(float(cep.first(m, "B", "value")), 2),
    }
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("click_id", LongType()),
            StructField("purchase_id", LongType()),
            StructField("purchase_value", DoubleType()),
        ]
    )
    out = cep.match_recognize_stream(
        sdf, ["user_id"], "ts", steps, measures, schema,
        after_match="to_next_row", within="2 hours", secondary_order="event_id",
    )
    return ssrc.run_to_memory(out, f"drain_cepany_{next(_seq)}", "append")


@query(
    "stream_cep_timeout_drain",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    matched AS (
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
      FROM clicks c JOIN events p
        ON p.user_id = c.user_id AND p.event_type = 'purchase'
       AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
       AND p.ts - c.ts <= INTERVAL '30 minutes'
      QUALIFY row_number() OVER (PARTITION BY c.event_id
                                 ORDER BY p.ts, p.event_id) = 1
    ),
    expired AS (
      SELECT c.user_id, c.event_id AS click_id,
             c.ts + INTERVAL '30 minutes' AS timeout_ts
      FROM clicks c
      WHERE NOT EXISTS (SELECT 1 FROM events p
                        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
                          AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
                          AND p.ts - c.ts <= INTERVAL '30 minutes')
        AND EXISTS (SELECT 1 FROM events e
                    WHERE e.user_id = c.user_id
                      AND e.ts - c.ts > INTERVAL '30 minutes')
    )
    SELECT 'match' AS side, user_id, click_id, purchase_id,
           CAST(NULL AS TIMESTAMP) AS timeout_ts FROM matched
    UNION ALL
    SELECT 'timeout' AS side, user_id, click_id, CAST(NULL AS BIGINT) AS purchase_id,
           timeout_ts FROM expired
    """,
    tags=("streaming", "cep", "timeout-side-output"),
)
def stream_cep_timeout_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING timed-out-partial side output drained end-to-end
    (TimedOutPartialMatchHandler.java:75 via CepOperator's advanceTime
    prune): pattern = click followedBy purchase WITHIN 30 min per user,
    after_match TO NEXT ROW. The drained union stream partitions the
    clicks: 'match' rows carry the (ts, event_id)-earliest qualifying
    purchase; 'timeout' rows are clicks whose window expired — i.e. the
    user has SOME event more than 30 min later (the stream's watermark
    passed click_ts + 30 min) and no qualifying purchase. Clicks whose
    window never expires stay open in state and emit nothing — standard
    watermark semantics, mirrored by the oracle's EXISTS guard."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from flink_1_16_0_src_spark.operators import cep

    sdf = ssrc.stream_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    steps = [
        cep.Step("A", lambda r, m: r["event_type"] == "click"),
        cep.Step("B", lambda r, m: r["event_type"] == "purchase", contiguity="relaxed"),
    ]
    measures = {
        "click_id": lambda m: cep.first(m, "A", "event_id"),
        "purchase_id": lambda m: cep.first(m, "B", "event_id"),
    }
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("click_id", LongType()),
            StructField("purchase_id", LongType()),
        ]
    )
    timeout_measures = {
        "click_id": lambda p, tts: cep.first(p, "A", "event_id"),
        "timeout_ts": lambda p, tts: tts,
    }
    timeout_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("click_id", LongType()),
            StructField("timeout_ts", TimestampType()),
        ]
    )
    out = cep.match_recognize_stream(
        sdf, ["user_id"], "ts", steps, measures, schema,
        after_match="to_next_row", within="30 minutes",
        secondary_order="event_id",
        timeout_measures=timeout_measures, timeout_schema=timeout_schema,
    )
    drained = ssrc.run_to_memory(out, f"drain_cepto_{next(_seq)}", "append")
    return drained.select(
        F.col("__side").alias("side"), "user_id", "click_id", "purchase_id",
        "timeout_ts",
    )


@query(
    "stream_temporal_sort_drain",
    oracle="""
    SELECT user_id, event_id, ts, round(value, 2) AS value FROM (
      SELECT user_id, event_id, ts, value,
             max(ts) OVER (PARTITION BY user_id) - INTERVAL '30 minutes' AS wm
      FROM events
    ) WHERE ts <= wm
    """,
    tags=("streaming", "sort"),
)
def stream_temporal_sort_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream temporal sort (StreamExecTemporalSort.java:64 /
    RowTimeSortOperator) drained end-to-end: rows buffer per key and
    release in event-time order once the carried watermark (per-key
    max ts − 30 min) passes them; the availableNow drain's emitted set
    = rows at-or-below the final watermark — the oracle's window
    filter."""
    from flink_1_16_0_src_spark.streaming.dedup import temporal_sort

    sdf = ssrc.stream_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    out = temporal_sort(sdf, "ts", "30 minutes", ["user_id"])
    drained = ssrc.run_to_memory(out, f"drain_tsort_{next(_seq)}", "append")
    return drained.select(
        "user_id", "event_id", "ts", F.round("value", 2).alias("value")
    )


@query(
    "stream_late_side_output_drain",
    oracle="""
    WITH wm AS (
      SELECT max(ts) - INTERVAL '30 minutes' AS w FROM events WHERE event_id % 2 = 0
    )
    SELECT event_id, user_id, ts FROM events, wm
    WHERE event_id % 2 = 1 AND ts < wm.w
    """,
    tags=("streaming", "late-data"),
)
def stream_late_side_output_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data side output (WindowedStream.sideOutputLateData parity,
    streaming/late.LateRowRouter): events staged as two deterministic
    micro-batches (even event_ids then odd); the carried
    bounded-out-of-orderness watermark after batch 1 is max(even ts) −
    30 min, so batch 2's side output = odd rows behind it — exactly the
    oracle's filter. Batch 1 has no late rows (watermark unset)."""
    import os
    import tempfile

    from flink_1_16_0_src_spark.streaming.late import route_late_rows
    from flink_1_16_0_src_spark.tables import load as _load

    ev = _load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    d = tempfile.mkdtemp(prefix="late_drain_")
    src_dir = os.path.join(d, "src")
    os.makedirs(src_dir)
    for i, pred in enumerate((F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1)):
        stage = os.path.join(d, f"stage{i}")
        ev.where(pred).coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dst = os.path.join(src_dir, f"{i:04d}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))

    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    late_rows: list = []

    def on_time(batch_df, batch_id):
        batch_df.count()  # drain the on-time side

    def on_late(batch_df, batch_id):
        late_rows.extend(batch_df.collect())

    q = (
        route_late_rows(sdf, "ts", "30 minutes", on_time, on_late)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(d, "ckpt"))
        .start()
    )
    q.awaitTermination()
    return spark.createDataFrame(late_rows, ev.schema)


@query(
    "stream_semi_join_drain",
    oracle="""
    SELECT p.user_id AS uid, p.event_id AS purchase_id
    FROM events p
    WHERE p.event_type = 'purchase'
      AND EXISTS (SELECT 1 FROM events c
                  WHERE c.user_id = p.user_id AND c.event_type = 'click')
    """,
    tags=("streaming", "join", "semi"),
)
def stream_semi_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SEMI join (StreamingSemiAntiJoinOperator.java:34)
    drained: a left (purchase) row emits +I exactly once, when EXISTS
    over the click side first becomes true — append-only changelog, so
    the drained set equals the batch EXISTS semi-join."""
    from flink_1_16_0_src_spark.streaming.joins import unbounded_join

    l = ssrc.stream_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(F.col("user_id").alias("uid"), F.col("event_id").alias("purchase_id"))
    r = ssrc.stream_table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    ).select(F.col("user_id").alias("ruid"), F.col("event_id").alias("click_id"))
    out = unbounded_join(l, r, ("uid", "ruid"), how="left_semi")
    drained = ssrc.run_to_memory(out, f"drain_semijoin_{next(_seq)}", "append")
    return drained.where(F.col("__rowkind") == "+I").select("uid", "purchase_id")


@query(
    "stream_count_window_evictor_drain",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS pos,
             count(*) OVER (PARTITION BY user_id) AS total
      FROM events
    )
    SELECT user_id,
           CAST(min(event_id) FILTER (WHERE pos % 5 = 2) AS BIGINT) AS win_start_event,
           CAST(count(*) FILTER (WHERE pos % 5 >= 2) AS BIGINT) AS n_kept,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) FILTER (WHERE pos % 5 >= 2) AS BIGINT) AS sum_cents
    FROM ordered
    WHERE (pos // 5 + 1) * 5 <= total
    GROUP BY user_id, pos // 5
    """,
    tags=("streaming", "count-window", "evictor"),
)
def stream_count_window_evictor_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count windows + CountEvictor drained (CountTumblingWindowAssigner
    + CountEvictor.of(3), streaming/late.py): per user, every 5 rows in
    (ts, event_id) order form a window; CountEvictor(3) trims each
    fired window to its LAST 3 rows before the window function runs
    (the real evictor path, not an agg-side emulation). Only FULL
    windows fire (the tail stays in state). Sums are exact integer
    cents so both engines hash identically regardless of fold
    order."""
    from flink_1_16_0_src_spark.streaming.late import streaming_count_window

    sdf = ssrc.stream_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )

    def agg(wpdf):
        # wpdf is the POST-EVICTION window: CountEvictor(3) already
        # trimmed the 5-row window to its last 3 rows
        return {
            "win_start_event": int(wpdf["event_id"].iloc[0]),
            "n_kept": len(wpdf),
            "sum_cents": int(
                sum(int(round(float(v) * 100)) for v in wpdf["value"])
            ),
        }

    out = streaming_count_window(
        sdf, ["user_id"], size=5, agg_fn=agg,
        output_schema="user_id bigint, win_start_event bigint, n_kept bigint, sum_cents bigint",
        evictor=("count", 3),
        order_col=["ts", "event_id"],
    )
    return ssrc.run_to_memory(out, f"drain_cntwin_{next(_seq)}", "append")


@query(
    "stream_anti_join_drain",
    oracle="""
    SELECT p.user_id AS uid, p.event_id AS purchase_id
    FROM events p
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (SELECT 1 FROM events c
                      WHERE c.user_id = p.user_id AND c.event_type = 'click')
    """,
    tags=("streaming", "join", "anti", "changelog"),
)
def stream_anti_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANTI join drained and COLLAPSED: a left row emits +I
    while NOT EXISTS holds and retracts with -D when the first match
    arrives (StreamingSemiAntiJoinOperator's NOT-EXISTS flip), so the
    net changelog per row (+I count − -D count > 0) equals the batch
    NOT EXISTS — order-independent even though intra-batch arrival
    order is not deterministic."""
    from flink_1_16_0_src_spark.streaming.joins import unbounded_join

    l = ssrc.stream_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(F.col("user_id").alias("uid"), F.col("event_id").alias("purchase_id"))
    r = ssrc.stream_table(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    ).select(F.col("user_id").alias("ruid"), F.col("event_id").alias("click_id"))
    out = unbounded_join(l, r, ("uid", "ruid"), how="left_anti")
    drained = ssrc.run_to_memory(out, f"drain_antijoin_{next(_seq)}", "append")
    net = (
        F.sum(F.when(F.col("__rowkind") == "+I", 1).otherwise(0))
        - F.sum(F.when(F.col("__rowkind") == "-D", 1).otherwise(0))
    )
    return (
        drained.groupBy("uid", "purchase_id")
        .agg(net.alias("__net"))
        .where(F.col("__net") > 0)
        .select("uid", "purchase_id")
    )


@query(
    "stream_retract_agg_drain",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS alive_cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM latest GROUP BY user_id
    """,
    tags=("streaming", "aggregate", "retract"),
)
def stream_retract_agg_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACT-MODE aggregation end-to-end: the events table becomes a
    +I/-U/+U changelog per (user, event_type) entity (the
    toChangelogStream bridge), streams through the retract aggregate
    keyed by user — -U cancels the superseded version exactly (integer
    cents) — and the drained state equals aggregating only each
    entity's LATEST version: the oracle's row_number()=1 projection.
    This is the update-stream semantics Flink's
    AggregateFunction.retract() exists for."""
    import os
    import tempfile

    from flink_1_16_0_src_spark.session import TableEnvironment
    from flink_1_16_0_src_spark.streaming.stateful import changelog_group_aggregate
    from flink_1_16_0_src_spark.tables import load as _load

    tenv = TableEnvironment(spark)
    ev = _load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    log = tenv.to_changelog_stream(ev, keys=["user_id", "event_type"], order_col="ts")
    d = tempfile.mkdtemp(prefix="retract_agg_")
    src = os.path.join(d, "log")
    # one file → one micro-batch → exactly one emission per key
    log.coalesce(1).write.parquet(src)
    sdf = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = changelog_group_aggregate(sdf, ["user_id"], "cents")
    drained = ssrc.run_to_memory(out, f"drain_retract_{next(_seq)}", "update")
    return drained.select("user_id", "alive_cnt", "sum_cents")


@query(
    "stream_trigger_window_drain",
    oracle="""
    WITH wm AS (
      SELECT user_id, max(ts) - INTERVAL '10 minutes' AS w
      FROM events GROUP BY user_id
    ),
    agg AS (
      SELECT user_id,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM events GROUP BY 1, 2, 3
    )
    SELECT a.user_id, a.window_start, a.window_end, a.n, a.sum_cents
    FROM agg a JOIN wm ON wm.user_id = a.user_id
    WHERE a.window_end <= wm.w
    """,
    tags=("streaming", "trigger", "custom-op"),
)
def stream_trigger_window_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic Trigger runner (WindowOperator.java + Trigger.java
    parity, streaming/triggers.py) drained end-to-end with
    EventTimeTrigger: per-user 1h tumbling windows fire exactly once
    when the carried per-key watermark (max ts − 10 min) passes the
    window end — emission = windows closed by the final watermark,
    the oracle's per-user wm filter. The same runner executes ARBITRARY
    user Trigger subclasses (count / purging / custom value-threshold —
    pytest-pinned in test_triggers.py); this drain is the
    driver-checkable representative."""
    from flink_1_16_0_src_spark.streaming.triggers import (
        EventTimeTrigger,
        triggered_tumble_window,
    )

    sdf = ssrc.stream_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    # hashed surface sums INTEGER CENTS (per-row round(value*100), the
    # repo's cents convention): a round(double-sum, 2) here would pit
    # Python's half-even against DuckDB's half-away rounding on an
    # order-dependent float sum — ADVICE r4
    out = triggered_tumble_window(
        sdf, ["user_id"], "ts", "1 hour", "10 minutes", EventTimeTrigger(),
        lambda w: {"n": len(w),
                   "sum_cents": int(w["value"].astype(float).mul(100).round().sum())},
        "user_id bigint, window_start timestamp, window_end timestamp, n bigint, sum_cents bigint",
        order_col="ts",
    )
    drained = ssrc.run_to_memory(out, f"drain_trigwin_{next(_seq)}", "append")
    return drained.select("user_id", "window_start", "window_end", "n", "sum_cents")


@query(
    "stream_late_refire_drain",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             time_bucket(INTERVAL '1 hour', ts) AS ws
      FROM events
    ),
    tagged AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, ws
                                   ORDER BY ts, event_id) AS rn
      FROM ev
    ),
    split AS (SELECT *, (rn > 1 AND event_id % 3 = 0) AS late FROM tagged),
    wm AS (
      SELECT user_id,
             max(CASE WHEN NOT late THEN ts END) - INTERVAL '10 minutes' AS wm1,
             max(ts) - INTERVAL '10 minutes' AS wm2
      FROM split GROUP BY user_id
    ),
    b1 AS (
      SELECT user_id, ws, count(*) AS n1, sum(cents) AS s1
      FROM split WHERE NOT late GROUP BY user_id, ws
    ),
    paneA AS (
      SELECT b.user_id, b.ws, b.n1 AS n, b.s1 AS sum_cents
      FROM b1 b JOIN wm ON wm.user_id = b.user_id
      WHERE b.ws + INTERVAL '1 hour' <= wm.wm1
    ),
    lateB AS (
      SELECT s.user_id, s.ws,
             row_number() OVER (PARTITION BY s.user_id, s.ws
                                ORDER BY s.ts, s.event_id) AS lrn,
             sum(s.cents) OVER (PARTITION BY s.user_id, s.ws
                                ORDER BY s.ts, s.event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS lcum
      FROM split s JOIN wm ON wm.user_id = s.user_id
      WHERE s.late
        AND s.ws + INTERVAL '1 hour' <= wm.wm1
        AND s.ws + INTERVAL '1 hour' + INTERVAL '90 minutes' > wm.wm1
    ),
    paneB AS (
      SELECT l.user_id, l.ws, b.n1 + l.lrn AS n, b.s1 + l.lcum AS sum_cents
      FROM lateB l JOIN b1 b ON b.user_id = l.user_id AND b.ws = l.ws
    ),
    paneC AS (
      SELECT s.user_id, s.ws, count(*) AS n, sum(s.cents) AS sum_cents
      FROM split s JOIN wm ON wm.user_id = s.user_id
      WHERE s.ws + INTERVAL '1 hour' > wm.wm1
        AND s.ws + INTERVAL '1 hour' <= wm.wm2
      GROUP BY s.user_id, s.ws
    )
    SELECT user_id, ws AS window_start,
           ws + INTERVAL '1 hour' AS window_end,
           CAST(n AS BIGINT) AS n, CAST(sum_cents AS BIGINT) AS sum_cents
    FROM (SELECT * FROM paneA UNION ALL SELECT * FROM paneB
          UNION ALL SELECT * FROM paneC)
    """,
    tags=("streaming", "trigger", "lateness", "custom-op"),
)
def stream_late_refire_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """allowedLateness late-firing end-to-end (WindowedStream.
    allowedLateness + EventTimeTrigger.onElement's late branch,
    EventTimeTrigger.java:59): events split into two DETERMINISTIC
    arrival batches — batch 2 = every non-first window row with
    event_id % 3 == 0, arriving after the per-key watermark advanced to
    max(batch-1 ts) − 10 min. Emission algebra the oracle reproduces
    exactly:

    - paneA: windows closed by wm1 fire once with batch-1 contents;
    - paneB: each within-lateness late element (end ≤ wm1 < end+90min)
      RE-FIRES an updated pane (cumulative n / cents in arrival order);
      beyond-lateness rows drop silently;
    - paneC: windows still open at wm1 absorb their "late" rows
      silently and fire once when wm2 closes them.
    """
    import os
    import tempfile

    from pyspark.sql import Window as W

    from flink_1_16_0_src_spark.streaming.triggers import (
        EventTimeTrigger,
        triggered_tumble_window,
    )
    from flink_1_16_0_src_spark.tables import load as _load

    ev = _load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value",
        F.window("ts", "1 hour").start.alias("__ws"),
    )
    rn = F.row_number().over(
        W.partitionBy("user_id", "__ws").orderBy("ts", "event_id")
    )
    tagged = ev.withColumn("__rn", rn).withColumn(
        "__late", (F.col("__rn") > 1) & (F.col("event_id") % 3 == 0)
    )
    d = tempfile.mkdtemp(prefix="late_refire_")
    src = os.path.join(d, "src")
    cols = ["user_id", "ts", "event_id", "value"]
    tagged.where(~F.col("__late")).select(*cols).coalesce(1).write.parquet(src)
    tagged.where(F.col("__late")).select(*cols).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # pin arrival order: FileStreamSource orders by mtime (ties by
    # path hash) — force strictly increasing mtimes so batch 1 is
    # always the on-time file
    parts = sorted(
        (os.path.getmtime(os.path.join(src, f)), f)
        for f in os.listdir(src) if f.endswith(".parquet")
    )
    base = parts[0][0]
    for k, (_m, f) in enumerate(parts):
        os.utime(os.path.join(src, f), (base + 10 * k, base + 10 * k))
    sdf = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = triggered_tumble_window(
        sdf, ["user_id"], "ts", "1 hour", "10 minutes", EventTimeTrigger(),
        lambda w: {"n": len(w),
                   "sum_cents": int(w["value"].astype(float).mul(100).round().sum())},
        "user_id bigint, window_start timestamp, window_end timestamp, "
        "n bigint, sum_cents bigint",
        order_col=["ts", "event_id"],
        allowed_lateness="90 minutes",
    )
    drained = ssrc.run_to_memory(out, f"drain_late_refire_{next(_seq)}", "append")
    return drained.select("user_id", "window_start", "window_end", "n", "sum_cents")


@query(
    "stream_continuous_trigger_drain",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             time_bucket(INTERVAL '1 hour', ts) AS ws
      FROM events
    ),
    tagged AS (
      SELECT *, row_number() OVER (PARTITION BY user_id, ws
                                   ORDER BY ts, event_id) AS rn
      FROM ev
    ),
    split AS (SELECT *, (rn > 1 AND event_id % 3 = 0) AS late FROM tagged),
    wm AS (
      SELECT user_id,
             max(CASE WHEN NOT late THEN ts END) - INTERVAL '10 minutes' AS wm1,
             max(ts) - INTERVAL '10 minutes' AS wm2
      FROM split GROUP BY user_id
    ),
    w AS (
      SELECT user_id, ws, ws + INTERVAL '1 hour' AS wend,
             time_bucket(INTERVAL '20 minutes', min(ts)) AS align0,
             count(*) AS nall, sum(cents) AS sall,
             count(*) FILTER (WHERE NOT late) AS n1,
             sum(cents) FILTER (WHERE NOT late) AS s1
      FROM split GROUP BY user_id, ws
    ),
    bounds AS (
      SELECT w.*, wm.wm1, wm.wm2,
             w.align0 + (k.k * INTERVAL '20 minutes') AS b
      FROM w JOIN wm ON wm.user_id = w.user_id, generate_series(1, 3) k(k)
    ),
    -- interval panes fired while only batch-1 rows were buffered
    paneA AS (
      SELECT user_id, ws, n1 AS n, s1 AS sum_cents FROM bounds
      WHERE b <= wm1 AND b < wend
    ),
    -- close pane of windows the batch-1 watermark already passed
    close1 AS (
      SELECT user_id, ws, n1 AS n, s1 AS sum_cents
      FROM (SELECT DISTINCT user_id, ws, wend, wm1, n1, s1 FROM bounds)
      WHERE wend <= wm1
    ),
    -- interval panes fired after batch 2 landed (full contents)
    paneB AS (
      SELECT user_id, ws, nall AS n, sall AS sum_cents FROM bounds
      WHERE b > wm1 AND b <= wm2 AND b < wend AND wend > wm1
    ),
    -- close pane of windows the batch-2 watermark closed
    close2 AS (
      SELECT user_id, ws, nall AS n, sall AS sum_cents
      FROM (SELECT DISTINCT user_id, ws, wend, wm1, wm2, nall, sall FROM bounds)
      WHERE wend > wm1 AND wend <= wm2
    )
    SELECT user_id, ws AS window_start, ws + INTERVAL '1 hour' AS window_end,
           CAST(n AS BIGINT) AS n, CAST(sum_cents AS BIGINT) AS sum_cents
    FROM (SELECT * FROM paneA UNION ALL SELECT * FROM close1
          UNION ALL SELECT * FROM paneB UNION ALL SELECT * FROM close2)
    """,
    tags=("streaming", "trigger", "timers", "custom-op"),
)
def stream_continuous_trigger_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ContinuousEventTimeTrigger end-to-end — the timer-registration
    path (TriggerContext.registerEventTimeTimer /
    ContinuousEventTimeTrigger.java): 20-minute speculative panes per
    1-hour window as the per-key watermark advances across two
    DETERMINISTIC arrival batches (same split as
    stream_late_refire_drain: non-first window rows with
    event_id % 3 == 0 arrive second). The oracle replays the timer
    algebra: boundaries (aligned from the window's first element)
    ≤ wm1 fire with batch-1 contents, boundaries in (wm1, wm2] fire
    with full contents, and each window's close pane fires exactly
    once with whatever had arrived; batch-2 rows for already-closed
    windows drop (allowedLateness 0)."""
    import os
    import tempfile

    from pyspark.sql import Window as W

    from flink_1_16_0_src_spark.streaming.triggers import (
        ContinuousEventTimeTrigger,
        triggered_tumble_window,
    )
    from flink_1_16_0_src_spark.tables import load as _load

    ev = _load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value",
        F.window("ts", "1 hour").start.alias("__ws"),
    )
    rn = F.row_number().over(
        W.partitionBy("user_id", "__ws").orderBy("ts", "event_id")
    )
    tagged = ev.withColumn("__rn", rn).withColumn(
        "__late", (F.col("__rn") > 1) & (F.col("event_id") % 3 == 0)
    )
    d = tempfile.mkdtemp(prefix="cont_trig_")
    src = os.path.join(d, "src")
    cols = ["user_id", "ts", "event_id", "value"]
    tagged.where(~F.col("__late")).select(*cols).coalesce(1).write.parquet(src)
    tagged.where(F.col("__late")).select(*cols).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    parts = sorted(
        (os.path.getmtime(os.path.join(src, f)), f)
        for f in os.listdir(src) if f.endswith(".parquet")
    )
    base = parts[0][0]
    for k, (_m, f) in enumerate(parts):
        os.utime(os.path.join(src, f), (base + 10 * k, base + 10 * k))
    sdf = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = triggered_tumble_window(
        sdf, ["user_id"], "ts", "1 hour", "10 minutes",
        ContinuousEventTimeTrigger("20 minutes", ts_col="ts"),
        lambda w: {"n": len(w),
                   "sum_cents": int(w["value"].astype(float).mul(100).round().sum())},
        "user_id bigint, window_start timestamp, window_end timestamp, "
        "n bigint, sum_cents bigint",
        order_col=["ts", "event_id"],
    )
    drained = ssrc.run_to_memory(out, f"drain_cont_trig_{next(_seq)}", "append")
    return drained.select("user_id", "window_start", "window_end", "n", "sum_cents")


@query(
    "stream_doc_dedup_drain",
    oracle="""
    SELECT bag_fp, doc_id, n_chars FROM (
      SELECT md5(array_to_string(list_sort(list_distinct(
               str_split_regex(lower(trim(text)), '\\s+'))), ' ')) AS bag_fp,
             doc_id, n_chars,
             row_number() OVER (
               PARTITION BY md5(array_to_string(list_sort(list_distinct(
                 str_split_regex(lower(trim(text)), '\\s+'))), ' '))
               ORDER BY doc_id) AS rk
      FROM documents
    ) WHERE rk = 1
    """,
    tags=("streaming", "stateful", "dedup", "pipeline"),
)
def stream_doc_dedup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup of the DOCUMENTS corpus: file stream →
    token-bag fingerprint (pure codegen'd expression) → keep-FIRST
    stateful dedup keyed on the fingerprint (order_col=doc_id —
    DeduplicateKeepFirstRowFunction parity via
    stateful.keep_first_dedup). This is the training-pipeline shape: a
    continuously-arriving crawl deduped online before it ever lands,
    instead of a batch pass afterwards. The fixture's bag fingerprint
    collides for token-shuffled near-dups (~10% of docs), so the
    operator binds. State is one row per distinct fingerprint —
    bounded by corpus cardinality exactly like the batch exact-dedup,
    and the keep-first rule makes emission deterministic under any
    arrival interleaving (min doc_id wins)."""
    from flink_1_16_0_src_spark.pipeline.text import bag_fingerprint
    from flink_1_16_0_src_spark.streaming.stateful import keep_first_dedup

    sdf = ssrc.stream_table(spark, sf_dir, "documents").select(
        bag_fingerprint("text").alias("bag_fp"), "doc_id", "n_chars"
    )
    out = keep_first_dedup(sdf, ["bag_fp"], order_col="doc_id")
    drained = ssrc.run_to_memory(out, f"drain_docdedup_{next(_seq)}", "update")
    return drained.select("bag_fp", "doc_id", "n_chars")


@query(
    "stream_lookup_join_drain",
    oracle="""
    SELECT e.event_id, e.user_id, n.n_name, e.event_type
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    WHERE e.event_id % 7 = 0
    """,
    tags=("streaming", "join", "lookup"),
)
def stream_lookup_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming lookup enrichment (LookupJoinUtil.java /
    StreamExecLookupJoin: probe side is the stream, build side the
    current dim snapshot): file-stream of events joined to the static
    nation dim — Structured Streaming's stream-static join, planned as
    a broadcast hash join inside every micro-batch, which is exactly
    the FOR SYSTEM_TIME AS OF proctime semantics (each batch sees the
    dim's current version). Drained with availableNow; append mode
    needs no watermark because a stream-static inner join is
    stateless."""
    from flink_1_16_0_src_spark.tables import load

    sdf = ssrc.stream_table(spark, sf_dir, "events")
    dim = load(spark, sf_dir, "nation")
    out = (
        sdf.where(F.col("event_id") % 7 == 0)
        .join(F.broadcast(dim), F.col("user_id") % 25 == F.col("n_nationkey"))
        .select("event_id", "user_id", "n_name", "event_type")
    )
    drained = ssrc.run_to_memory(out, f"drain_lookup_{next(_seq)}", "append")
    return drained.select("event_id", "user_id", "n_name", "event_type")


@query(
    "stream_sql_tumble_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    agg AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
             time_bucket(INTERVAL '30 minutes', ts) + INTERVAL '30 minutes' AS window_end,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, window_end, n, sum_value
    FROM agg, wm WHERE agg.window_end <= wm.w
    """,
    tags=("streaming", "window", "sql-surface"),
)
def stream_sql_tumble_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SQL TEXT end-to-end: DDL table (filesystem connector +
    WATERMARK clause) → TableEnvironment.stream_query with a TUMBLE
    window TVF written as SQL → streaming plan drained availableNow.
    The full reference workflow — CREATE TABLE, streaming sqlQuery,
    sink — in one driver-checked path; emitted set = watermark-closed
    windows like every append drain."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT window_start, window_end,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM TABLE(TUMBLE(TABLE sq_events_{k}, DESCRIPTOR(ts), INTERVAL '30' MINUTES))
        GROUP BY window_start, window_end
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqltvf_{k}", "append")
    return drained.select("window_start", "window_end", "n", "sum_value")


@query(
    "stream_sql_session_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    flagged AS (
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
    ), agg AS (
      SELECT user_id,
             min(ts) AS window_start,
             max(ts) + INTERVAL '2 hours' AS window_end,
             count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM sessions
      GROUP BY user_id, session_id
    )
    SELECT user_id, window_start, window_end, n, sum_value
    FROM agg, wm WHERE agg.window_end <= wm.w
    """,
    tags=("streaming", "session", "sql-surface"),
)
def stream_sql_session_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SESSION as SQL TEXT (VERDICT r7 #3): DDL table with
    WATERMARK → stream_query over the SESSION window TVF → append
    drain. The TVF resolves to the raw streaming frame and the GROUP BY
    regroups onto Spark's merging ``session_window`` aggregate
    (SqlSessionTableFunction.java; SessionWindowAssigner merging
    windows) — same emitted set as stream_session_drain: sessions whose
    end (last event + gap) the final watermark passed."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_sess_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, window_start, window_end,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM TABLE(SESSION(TABLE sq_sess_events_{k} PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '2' HOUR))
        GROUP BY user_id, window_start, window_end
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlsess_{k}", "append")
    return drained.select("user_id", "window_start", "window_end", "n", "sum_value")


@query(
    "stream_sql_cumulate_drain",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', e.ts) AS window_start,
           time_bucket(INTERVAL '1 hour', e.ts) + (k.k * INTERVAL '20 minutes') AS window_end,
           count(*) AS n
    FROM events e, generate_series(1, 3) k(k)
    WHERE time_bucket(INTERVAL '1 hour', e.ts) + (k.k * INTERVAL '20 minutes') > e.ts
    GROUP BY 1, 2
    """,
    tags=("streaming", "window-tvf", "sql-surface", "custom-op"),
)
def stream_sql_cumulate_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CUMULATE as SQL TEXT (VERDICT r7 #3): the TVF resolves
    to the slice-explode view over the streaming frame
    (SliceAssigners.java:94 expanding slices) and the plain
    window_start/window_end grouping drains in UPDATE mode with one
    availableNow batch — the memory sink then holds the final value of
    every slice, equal to the batch CUMULATE (the oracle), matching the
    stream_cumulate_drain contract."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_cum_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT window_start, window_end, count(*) AS n
        FROM TABLE(CUMULATE(TABLE sq_cum_events_{k}, DESCRIPTOR(ts),
                            INTERVAL '20' MINUTES, INTERVAL '1' HOUR))
        GROUP BY window_start, window_end
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlcum_{k}", "update")
    return drained.select("window_start", "window_end", "n")


@query(
    "stream_sql_groupwin_session_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    flagged AS (
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
    ), agg AS (
      SELECT user_id,
             min(ts) AS window_start,
             count(*) AS n,
             round(sum(value), 2) AS sum_value,
             max(ts) + INTERVAL '2 hours' AS window_end
      FROM sessions
      GROUP BY user_id, session_id
    )
    SELECT user_id, window_start, n, sum_value
    FROM agg, wm WHERE agg.window_end <= wm.w
    """,
    tags=("streaming", "session", "sql-surface"),
)
def stream_sql_groupwin_session_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEGACY ``GROUP BY SESSION(ts, gap)`` + ``SESSION_START`` aux in
    STREAMING mode through stream_query (pre-FLIP-145 syntax,
    StreamExecGroupWindowAggregate.java:88) — the raw frame regroups
    onto the merging session_window aggregate exactly like the SESSION
    TVF path; emitted set = watermark-closed sessions."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_gws_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, SESSION_START(ts, INTERVAL '2' HOUR) AS window_start,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM sq_gws_events_{k} GROUP BY user_id, SESSION(ts, INTERVAL '2' HOUR)
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlgws_{k}", "append")
    return drained.select("user_id", "window_start", "n", "sum_value")


@query(
    "stream_sql_window_join_drain",
    oracle="""
    SELECT a.user_id,
           time_bucket(INTERVAL '1 hour', a.ts) AS window_start,
           a.event_id AS click_id, b.event_id AS purchase_id
    FROM events a JOIN events b
      ON time_bucket(INTERVAL '1 hour', a.ts) = time_bucket(INTERVAL '1 hour', b.ts)
     AND a.user_id = b.user_id
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """,
    tags=("streaming", "join", "window", "sql-surface"),
)
def stream_sql_window_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING window join as SQL TEXT — the reference's documented
    two-TVF form (window-join.md; StreamExecWindowJoin.java): both
    sides are TUMBLE TVFs and the ON clause equates window_start,
    window_end and the key. The TVF views keep their event-time
    linkage, the single-side WHERE filters push below the join into
    each scan (state holds only filtered rows at scale), and the inner
    join drains append with one availableNow batch = all matches (the
    oracle: the batch window self-join of clicks x purchases)."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    for side in ("l", "r"):
        t.execute_sql(
            f"CREATE TABLE sq_wj_{side}_{k} (event_id BIGINT, ts TIMESTAMP(3),"
            f" user_id BIGINT, event_type STRING, value DOUBLE,"
            f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
            f" WITH ('connector'='filesystem',"
            f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
            f"'format'='parquet')"
        )
    out = t.stream_query(f"""
        SELECT L.user_id, L.window_start,
               L.event_id AS click_id, R.event_id AS purchase_id
        FROM TABLE(TUMBLE(TABLE sq_wj_l_{k}, DESCRIPTOR(ts), INTERVAL '1' HOUR)) L
        JOIN TABLE(TUMBLE(TABLE sq_wj_r_{k}, DESCRIPTOR(ts), INTERVAL '1' HOUR)) R
          ON L.window_start = R.window_start AND L.window_end = R.window_end
         AND L.user_id = R.user_id
        WHERE L.event_type = 'click' AND R.event_type = 'purchase'
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlwj_{k}", "append")
    return drained.select("user_id", "window_start", "click_id", "purchase_id")


@query(
    "stream_sql_interval_join_drain",
    oracle="""
    SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts BETWEEN a.ts AND a.ts + INTERVAL '1 hour'
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """,
    tags=("streaming", "join", "interval", "sql-surface"),
)
def stream_sql_interval_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING interval join as SQL TEXT (StreamExecIntervalJoin;
    the reference's time-bounded join syntax): plain DDL-table
    references in stream_query now resolve to watermarked streaming
    frames, so the BETWEEN time-bound + key equality compiles to
    Spark's stream-stream join with watermark state cleanup. Inner
    join drains append with one availableNow batch = all matches."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    for side in ("l", "r"):
        t.execute_sql(
            f"CREATE TABLE sq_ij_{side}_{k} (event_id BIGINT, ts TIMESTAMP(3),"
            f" user_id BIGINT, event_type STRING, value DOUBLE,"
            f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
            f" WITH ('connector'='filesystem',"
            f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
            f"'format'='parquet')"
        )
    out = t.stream_query(f"""
        SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
        FROM sq_ij_l_{k} a JOIN sq_ij_r_{k} b
          ON a.user_id = b.user_id
         AND b.ts BETWEEN a.ts AND a.ts + INTERVAL '1' HOUR
        WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlij_{k}", "append")
    return drained.select("user_id", "click_id", "purchase_id")


@query(
    "stream_sql_lookup_join_drain",
    oracle="""
    SELECT e.event_id, e.user_id, n.n_name, e.event_type
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    WHERE e.event_id % 11 = 0
    """,
    tags=("streaming", "join", "lookup", "sql-surface"),
)
def stream_sql_lookup_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING lookup join as SQL TEXT (joins.md "Lookup Join",
    StreamExecLookupJoin): probe DDL table with ``pt AS PROCTIME()``,
    ``JOIN dim FOR SYSTEM_TIME AS OF e.pt`` through stream_query — the
    marker drops (each micro-batch joins the dim's CURRENT snapshot),
    the dim stays the batch view while the probe streams, and Spark
    plans the stateless stream-static broadcast join. Append drain
    needs no watermark."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment
    from flink_1_16_0_src_spark.tables import load

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_lk_ev_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" pt AS PROCTIME())"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    t.execute_sql(
        f"CREATE TABLE sq_lk_dim_{k} (n_nationkey BIGINT, n_name STRING,"
        f" n_regionkey BIGINT, n_comment STRING)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'nation.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT e.event_id, e.user_id, n.n_name, e.event_type
        FROM sq_lk_ev_{k} AS e
        JOIN sq_lk_dim_{k} FOR SYSTEM_TIME AS OF e.pt AS n
          ON e.user_id % 25 = n.n_nationkey
        WHERE e.event_id % 11 = 0
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqllk_{k}", "append")
    return drained.select("event_id", "user_id", "n_name", "event_type")


@query(
    "stream_sql_match_recognize_drain",
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
    tags=("streaming", "cep", "match-recognize", "sql-surface"),
)
def stream_sql_match_recognize_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE as STREAMING SQL TEXT (StreamExecMatch.java:59 —
    the reference's primary CEP surface IS streaming SQL): stream_query
    lowers the clause onto the per-key stateful NFA buffer
    (operators.cep.match_recognize_stream, the CepOperator analog) and
    the adjacent click→purchase matches drain append. Pattern (A B)
    with strict adjacency makes SKIP PAST LAST ROW equal the batch
    lead() rewrite — the same oracle as the batch cep_sql_match, so
    the streaming and batch lowerings are cross-checked against each
    other."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_mr_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT * FROM sq_mr_events_{k} MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(A.event_id) AS click_id,
                   FIRST(B.event_id) AS purchase_id,
                   FIRST(B.value) AS purchase_value
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B)
          DEFINE A AS event_type = 'click',
                 B AS event_type = 'purchase'
        )
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlmr_{k}", "append")
    return drained.select("user_id", "click_id", "purchase_id", "purchase_value")


@query(
    "stream_sql_match_runsum_drain",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS vi,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    clicks AS (
      SELECT user_id, event_id, vi, rn,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS isl
      FROM ordered WHERE event_type = 'click'
    ),
    cum AS (
      SELECT user_id, isl, rn, event_id, vi,
             sum(vi) OVER (PARTITION BY user_id, isl ORDER BY rn) AS cumvi,
             min(rn) OVER (PARTITION BY user_id, isl) AS first_rn
      FROM clicks
    ),
    runs AS (
      SELECT user_id, isl, min(first_rn) AS first_rn,
             CAST(count(*) AS BIGINT) AS n_clicks,
             CAST(sum(vi) AS BIGINT) AS sum_vi,
             arg_min(event_id, rn) AS first_click
      FROM cum WHERE cumvi < 10000
      GROUP BY user_id, isl
    )
    SELECT o.user_id, o.event_id AS anchor_id, r.first_click,
           r.n_clicks, r.sum_vi
    FROM ordered o
    JOIN runs r ON r.user_id = o.user_id AND r.first_rn = o.rn + 1
    WHERE o.event_type = 'purchase'
    """,
    tags=("streaming", "cep", "match-recognize", "sql-surface"),
)
def stream_sql_match_runsum_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of cep_sql_running_sum (r12, VERDICT r11 #3):
    the running aggregate over the variable being defined —
    ``DEFINE A AS SUM(A.vi) < 10000`` — evaluated inside the per-key
    stateful NFA buffer from match state, fed through a streaming VIEW
    that derives the integer cents column. Same oracle as the batch
    query, so the streaming and batch lowerings cross-check."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_rs_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    t.execute_sql(
        f"CREATE TEMPORARY VIEW sq_rs_vi_{k} AS"
        f" SELECT user_id, event_id, ts, event_type,"
        f" CAST(ROUND(value * 100) AS BIGINT) AS vi"
        f" FROM sq_rs_events_{k}"
    )
    out = t.stream_query(f"""
        SELECT * FROM sq_rs_vi_{k} MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(S.event_id) AS anchor_id,
                   FIRST(A.event_id) AS first_click,
                   COUNT(A.*) AS n_clicks,
                   SUM(A.vi) AS sum_vi
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (S A+)
          DEFINE S AS event_type = 'purchase',
                 A AS event_type = 'click' AND SUM(A.vi) < 10000
        )
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlrs_{k}", "append")
    return drained.select(
        "user_id", "anchor_id", "first_click",
        F.col("n_clicks").cast("bigint").alias("n_clicks"),
        F.col("sum_vi").cast("bigint").alias("sum_vi"),
    )


@query(
    "stream_sql_group_agg_drain",
    oracle="""
    SELECT user_id, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "agg", "sql-surface"),
)
def stream_sql_group_agg_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous (non-windowed) streaming GROUP BY as SQL TEXT
    (StreamExecGroupAggregate.java — Flink's unbounded group agg that
    emits an update stream): the raw DDL-table reference streams
    through stream_query and the aggregate drains in UPDATE mode with
    one availableNow batch, so the memory sink holds each key's final
    value = the batch aggregate (the oracle)."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ga_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM sq_ga_events_{k} GROUP BY user_id
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlga_{k}", "update")
    return drained.select("user_id", "n", "sum_value")


@query(
    "stream_sql_over_drain",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER w, 2) AS range_sum,
           count(value) OVER w AS range_cnt
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '30 minutes' PRECEDING AND CURRENT ROW)
    """,
    tags=("streaming", "over", "sql-surface"),
)
def stream_sql_over_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OVER aggregation as SQL TEXT (VERDICT r8 #3): the DDL
    table's event-time RANGE frame lowers through stream_query onto
    stateful.streaming_over_bounded — the reference's
    StreamExecOverAggregate.java:91 planning
    RowTimeRangeBoundedPrecedingFunction.java (retract rows strictly
    older than cur - interval; the bound row itself stays IN the
    frame, matching SQL RANGE's inclusive preceding edge). Every input
    row emits exactly one output row (append), so the drained set
    equals the batch window oracle; (user_id, ts) is unique in events
    at every SF, so frame content is tie-free on both engines."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ovr_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, event_id,
               SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '30' MINUTE PRECEDING AND CURRENT ROW)
                   AS range_sum,
               COUNT(value) OVER (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL '30' MINUTE PRECEDING AND CURRENT ROW)
                   AS range_cnt
        FROM sq_ovr_events_{k}
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlovr_{k}", "append")
    return drained.select(
        "user_id", "event_id",
        F.round("range_sum", 2).alias("range_sum"), "range_cnt",
    )


@query(
    "stream_sql_over_rows_drain",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER w, 2) AS roll_sum,
           round(min(value) OVER w, 2) AS roll_min,
           round(max(value) OVER w, 2) AS roll_max
    FROM events
    WHERE event_type = 'click'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tags=("streaming", "over", "sql-surface"),
)
def stream_sql_over_rows_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ROWS-bounded OVER as SQL TEXT with a WHERE pushed
    below the window (VERDICT r8 #3's rows-bounded variant):
    stream_query lowers onto streaming_over_bounded(rows=4) — the
    reference's RowTimeRowsBoundedPrecedingFunction.java keeping the
    last n rows per key as retract state. The filter runs before frame
    assembly exactly like Flink's Calc-under-OverAggregate plan, so
    frames count only 'click' rows; ts is unique per user (tie-free
    ROWS numbering on both engines)."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ovrr_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, event_id,
               SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS roll_sum,
               MIN(value) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS roll_min,
               MAX(value) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS roll_max
        FROM sq_ovrr_events_{k} WHERE event_type = 'click'
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlovrr_{k}", "append")
    return drained.select(
        "user_id", "event_id",
        F.round("roll_sum", 2).alias("roll_sum"),
        F.round("roll_min", 2).alias("roll_min"),
        F.round("roll_max", 2).alias("roll_max"),
    )


@query(
    "stream_sql_temporal_join_drain",
    oracle="""
    WITH v AS (
      SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS vts,
             o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1
    )
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           v.o_orderkey AS version_orderkey,
           round(v.o_totalprice, 2) AS version_price
    FROM events e
    ASOF JOIN v ON e.user_id = v.o_custkey AND e.ts >= v.vts
    """,
    tags=("streaming", "temporal", "sql-surface"),
)
def stream_sql_temporal_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time temporal join as streaming SQL TEXT (VERDICT r8 #4):
    two DDL tables with WATERMARKs, ``JOIN v FOR SYSTEM_TIME AS OF
    e.ts`` lowered through stream_query onto the as-of state machine
    (StreamExecTemporalJoin.java:77 / TemporalRowTimeJoinOperator.java:
    version rows held per key, each probe row binds the latest version
    at or before its rowtime; INNER drops version-less probes). The
    version table is the per-(customer, day) max-orderkey order — the
    same tie-free versioned fixture as stream_asof_drain, here
    PRE-materialized to parquet so the whole statement is pure SQL
    text over DDL tables. Equals DuckDB's native ASOF JOIN."""
    import os as _os
    import tempfile as _tf

    from pyspark.sql import Window as W

    from flink_1_16_0_src_spark.session import TableEnvironment
    from flink_1_16_0_src_spark.tables import load

    t = TableEnvironment(spark)
    k = next(_seq)
    # versioned fixture: one row per (custkey, orderdate) — version
    # timestamps are unique per key, so bisect ties cannot occur
    w = W.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    vdir = _os.path.join(_tf.mkdtemp(prefix="tjv_"), "versions")
    (
        load(spark, sf_dir, "orders")
        .withColumn("__rn", F.row_number().over(w)).where("__rn = 1")
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("timestamp").alias("vts"),
            "o_orderkey", "o_totalprice",
        )
        .write.mode("overwrite").parquet(vdir)
    )
    t.execute_sql(
        f"CREATE TABLE sq_tj_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    t.execute_sql(
        f"CREATE TABLE sq_tj_versions_{k} (o_custkey BIGINT, vts TIMESTAMP(3),"
        f" o_orderkey BIGINT, o_totalprice DOUBLE,"
        f" WATERMARK FOR vts AS vts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem','path'='{vdir}','format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT e.event_id, e.user_id, e.ts,
               v.o_orderkey AS version_orderkey,
               v.o_totalprice AS version_price
        FROM sq_tj_events_{k} AS e
        JOIN sq_tj_versions_{k} FOR SYSTEM_TIME AS OF e.ts AS v
        ON e.user_id = v.o_custkey
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqltj_{k}", "append")
    return drained.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        "version_orderkey",
        F.round("version_price", 2).alias("version_price"),
    )

@query(
    "stream_sql_match_prev_drain",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(value) OVER w IS NULL
                       OR value >= lag(value) OVER w THEN 1 ELSE 0 END AS head
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), runs AS (
      SELECT user_id, ts, value,
             sum(head) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS rid
      FROM seq
    )
    SELECT user_id,
           round(arg_min(value, ts), 2) AS start_v,
           round(arg_max(value, ts), 2) AS bottom_v,
           CAST(count(*) - 1 AS BIGINT) AS n_drops
    FROM runs
    GROUP BY user_id, rid
    HAVING count(*) >= 2
    """,
    tags=("streaming", "cep", "sql-surface"),
)
def stream_sql_match_prev_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATCH_RECOGNIZE with a PREV DEFINE as SQL TEXT
    (VERDICT r8 #6): falling-value runs per user — PATTERN (A B+),
    B AS value < PREV(B.value). The PREV helper materializes as an
    index offset into the per-key NFA buffer
    (IterativeConditionRunner.java:31 over the SharedBuffer) and the
    DEFINE runs as a per-row predicate; greedy B+ with SKIP PAST LAST
    ROW makes each match exactly one maximal strictly-decreasing run
    (length >= 2: head = A, descents = B), which the oracle rebuilds
    with a head-marker run segmentation. ts is unique per user, so
    arg_min/arg_max pick the head/bottom deterministically; raw-double
    comparisons (value < prev value) bitwise-match across engines
    because no arithmetic is applied before the compare."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_mrp_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT * FROM sq_mrp_events_{k} MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(A.value) AS start_v,
                   LAST(B.value) AS bottom_v,
                   COUNT(B.value) AS n_drops
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          DEFINE B AS value < PREV(B.value)
        )
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlmrp_{k}", "append")
    return drained.select(
        "user_id",
        F.round("start_v", 2).alias("start_v"),
        F.round("bottom_v", 2).alias("bottom_v"),
        "n_drops",
    )


@query(
    "stream_sql_over_unbounded_drain",
    oracle="""
    SELECT user_id, event_id,
           count(*) OVER w AS running_cnt,
           round(sum(value) OVER w, 2) AS running_sum,
           round(min(value) OVER w, 2) AS running_min
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("streaming", "over", "sql-surface"),
)
def stream_sql_over_unbounded_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frameless (UNBOUNDED PRECEDING) streaming OVER as SQL TEXT —
    the third OVER frame class, lowering onto
    streaming_over_unbounded (ProcTimeUnboundedPrecedingFunction
    contract: running accumulators per key, one emit per row). The
    COUNT(*) item rides the same pass via a constant value column.
    ts is unique per user, so running values are tie-free on both
    engines."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ovru_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, event_id,
               COUNT(value) OVER (PARTITION BY user_id ORDER BY ts) AS running_cnt,
               SUM(value) OVER (PARTITION BY user_id ORDER BY ts) AS running_sum,
               MIN(value) OVER (PARTITION BY user_id ORDER BY ts) AS running_min
        FROM sq_ovru_events_{k}
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlovru_{k}", "append")
    return drained.select(
        "user_id", "event_id", "running_cnt",
        F.round("running_sum", 2).alias("running_sum"),
        F.round("running_min", 2).alias("running_min"),
    )


@query(
    "stream_sql_over_multi_drain",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER w, 2) AS roll_sum,
           CAST(max(event_id) OVER w AS BIGINT) AS roll_max_id,
           count(*) OVER w AS roll_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    """,
    tags=("streaming", "over", "sql-surface"),
)
def stream_sql_over_multi_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate streaming OVER over DIFFERENT value columns in
    one window spec (the reference's StreamExecOverAggregate plans
    SUM(a), MAX(b), COUNT(*) as ONE exec node): lowers onto
    streaming_over_multi — per-key tail state shared across all three
    aggregates, vectorized pandas rolling. event_id rides the double
    aggregate buffer and casts back exactly (ids far below 2^53)."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ovrm_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, event_id,
               SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS roll_sum,
               MAX(event_id) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS roll_max_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS roll_n
        FROM sq_ovrm_events_{k}
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlovrm_{k}", "append")
    return drained.select(
        "user_id", "event_id",
        F.round("roll_sum", 2).alias("roll_sum"),
        F.col("roll_max_id").cast("bigint").alias("roll_max_id"),
        "roll_n",
    )


@query(
    "stream_sql_temporal_fn_drain",
    oracle="""
    WITH v AS (
      SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS vts,
             o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1
    )
    SELECT e.event_id, e.user_id,
           v.o_orderkey AS version_orderkey,
           round(v.o_totalprice, 2) AS version_price
    FROM events e
    ASOF JOIN v ON e.user_id = v.o_custkey AND e.ts >= v.vts
    WHERE e.event_type = 'click'
    """,
    tags=("streaming", "temporal", "sql-surface"),
)
def stream_sql_temporal_fn_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LEGACY temporal table FUNCTION join as streaming SQL text —
    ``FROM events, LATERAL TABLE (orders_fn(e.ts)) WHERE key = key``
    (TemporalTableFunctionImpl.java; the reference's classic streaming
    rates pattern) — lowering onto the same as-of state machine as the
    FOR SYSTEM_TIME form: history registered via
    create_temporal_table_function (per-(customer, day) max-orderkey
    versions, tie-free), probe filter pushed below the join, inner
    semantics. Same oracle family as stream_sql_temporal_join_drain
    plus the probe-side filter."""
    import os as _os

    from pyspark.sql import Window as W

    from flink_1_16_0_src_spark.session import TableEnvironment
    from flink_1_16_0_src_spark.tables import load

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ttf_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    w = W.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    hist = (
        load(spark, sf_dir, "orders")
        .withColumn("__rn", F.row_number().over(w)).where("__rn = 1")
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("timestamp").alias("vts"),
            "o_orderkey", "o_totalprice",
        )
    )
    t.create_temporal_table_function(f"orders_fn_{k}", hist, "vts", "o_custkey")
    out = t.stream_query(f"""
        SELECT e.event_id, e.user_id,
               v.o_orderkey AS version_orderkey,
               v.o_totalprice AS version_price
        FROM sq_ttf_events_{k} AS e, LATERAL TABLE (orders_fn_{k}(e.ts)) AS v
        WHERE v.o_custkey = e.user_id AND e.event_type = 'click'
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlttf_{k}", "append")
    return drained.select(
        "event_id", "user_id", "version_orderkey",
        F.round("version_price", 2).alias("version_price"),
    )


@query(
    "stream_sql_topn_drain",
    oracle="""
    SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rn FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'click'
    ) t WHERE rn <= 3
    """,
    tags=("streaming", "topn", "sql-surface"),
)
def stream_sql_topn_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's CANONICAL streaming Top-N statement as SQL TEXT — the
    row_number-filter pattern (SELECT ... FROM (SELECT ...,
    ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) AS rn FROM t)
    WHERE rn <= 3) planning as StreamExecRank / AppendOnlyTopNFunction
    instead of a window (FlinkLogicalRankRule parity). Inner WHERE
    runs below the rank; update-mode drain holds the final top-3
    'click' events per user; event_id unique → deterministic ranks."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_tn_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, event_id, value, rn FROM (
          SELECT user_id, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM sq_tn_events_{k} WHERE event_type = 'click'
        ) WHERE rn <= 3
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqltn_{k}", "update")
    return drained.select(
        "user_id", "event_id", "value", F.col("rn").cast("bigint").alias("rn")
    )


@query(
    "stream_sql_dedup_keeplast_drain",
    oracle="""
    SELECT user_id, event_type, event_id, round(value, 2) AS value FROM (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
    tags=("streaming", "dedup", "sql-surface"),
)
def stream_sql_dedup_keeplast_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's documented streaming DEDUPLICATION SQL pattern — the
    row_number-filter with ``rn = 1`` ORDER BY the time attribute DESC
    (deduplication.md; planned as StreamExecDeduplicate keep-last when
    the order key is rowtime). Lowers through the same rank-pattern
    path as Top-N (rn = 1 ≡ top-1 per key): update-mode drain holds
    the LAST row per (user, event_type). (user, type, ts) is tie-free
    at every SF."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_dkl_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, event_type, event_id, value FROM (
          SELECT user_id, event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC) AS rn
          FROM sq_dkl_events_{k}
        ) WHERE rn = 1
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqldkl_{k}", "update")
    return drained.select(
        "user_id", "event_type", "event_id",
        F.round("value", 2).alias("value"),
    )


@query(
    "stream_sql_composed_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    pairs AS (
      SELECT b.ts AS ts, b.value AS value
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND b.ts BETWEEN a.ts AND a.ts + INTERVAL '1 hour'
      WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    ),
    agg AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             count(*) AS n,
             round(sum(value), 2) AS total_value
      FROM pairs GROUP BY 1, 2
    )
    SELECT window_start, window_end, n, total_value
    FROM agg, wm WHERE agg.window_end <= wm.w
    """,
    tags=("streaming", "composition", "sql-surface"),
)
def stream_sql_composed_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SQL STATEMENT COMPOSITION (VERDICT r9 #2): an
    interval-join pipeline registered as a STREAMING VIEW
    (create_streaming_view — the reference expands views at plan time
    and optimizes the whole multi-operator statement as one DAG,
    StreamCommonSubGraphBasedOptimizer.scala:49), then consumed as the
    TVF table argument of a TUMBLE aggregation in ONE statement:
    join → window agg, the canonical two-operator streaming DAG a
    Flink user writes as a single query. The join's event-time column
    keeps its watermark linkage through the view, so the windowed agg
    still proves append mode; emitted set = windows closed by the
    final watermark (the oracle's wm gate, same contract as
    stream_tumble_drain)."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    for side in ("l", "r"):
        t.execute_sql(
            f"CREATE TABLE sq_cmp_{side}_{k} (event_id BIGINT, ts TIMESTAMP(3),"
            f" user_id BIGINT, event_type STRING, value DOUBLE,"
            f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
            f" WITH ('connector'='filesystem',"
            f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
            f"'format'='parquet')"
        )
    t.create_streaming_view(f"sq_cmp_pairs_{k}", f"""
        SELECT b.ts AS ts, b.value AS value
        FROM sq_cmp_l_{k} a JOIN sq_cmp_r_{k} b
          ON a.user_id = b.user_id
         AND b.ts BETWEEN a.ts AND a.ts + INTERVAL '1' HOUR
        WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """)
    out = t.stream_query(f"""
        SELECT window_start, window_end, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM TABLE(TUMBLE(TABLE sq_cmp_pairs_{k}, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, window_end
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlcmp_{k}", "append")
    return drained.select("window_start", "window_end", "n", "total_value")


@query(
    "stream_sql_nested2_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    j AS (
      SELECT e.ts AS ts, c.c_nationkey AS nation, e.value AS value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.event_type = 'purchase'
    ),
    win AS (
      SELECT nation,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
               AS window_end,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS total
      FROM j GROUP BY nation, time_bucket(INTERVAL '1 hour', ts)
    )
    SELECT nation, window_start, window_end, n, total FROM win
    WHERE window_end <= (SELECT w FROM wm)
    """,
    tags=("streaming", "composition", "sql-surface"),
)
def stream_sql_nested2_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-level statement nesting in ONE streaming statement
    (VERDICT r10 next #4 — the depth cap is lifted; the reference
    plans arbitrary-depth DAGs from one statement,
    StreamCommonSubGraphBasedOptimizer.scala:49): a FILTER subquery
    (purchases only) nests inside a JOIN subquery (stream x batch
    customer dim — stateless per row, so it streams), which is the
    window TVF's own TABLE ( ... ) argument of a TUMBLE aggregation —
    filter → join → window agg with no intermediate view. The
    event-time column keeps its watermark linkage through both
    subqueries, so the windowed agg still drains append; emitted set =
    windows closed by the final watermark (the source watermark
    advances on ALL events, clicks included — the oracle's wm gate
    mirrors that)."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment
    from flink_1_16_0_src_spark.tables import load

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_n2_ev_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    load(spark, sf_dir, "customer").createOrReplaceTempView(f"sq_n2_cust_{k}")
    out = t.stream_query(f"""
        SELECT nation, window_start, window_end, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total
        FROM TABLE(TUMBLE(TABLE (
            SELECT i.ts AS ts, c.c_nationkey AS nation, i.value AS value
            FROM (
                SELECT ts, user_id, value FROM sq_n2_ev_{k}
                WHERE event_type = 'purchase'
            ) i JOIN sq_n2_cust_{k} c ON i.user_id = c.c_custkey
        ), DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY nation, window_start, window_end
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqln2_{k}", "append")
    return drained.select("nation", "window_start", "window_end", "n", "total")


@query(
    "stream_sql_subquery_over_drain",
    oracle="""
    SELECT user_id, event_id,
           count(*) OVER w AS buy_cnt,
           round(sum(value) OVER w, 2) AS buy_sum
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("streaming", "composition", "over", "sql-surface"),
)
def stream_sql_subquery_over_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SQL composition form 2 (VERDICT r9 #2): an INLINE
    parenthesized FROM-subquery feeding the OVER lowering in one
    statement — stream_query compiles the inner SELECT recursively to
    a streaming relation and the outer statement's
    StreamExecOverAggregate lowering consumes it like any named table
    (the subquery's filter is the Calc below the over window in the
    reference's plan). ts is unique per user, so running values are
    tie-free on both engines."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_sqov_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, event_id,
               COUNT(value) OVER (PARTITION BY user_id ORDER BY ts) AS buy_cnt,
               SUM(value) OVER (PARTITION BY user_id ORDER BY ts) AS buy_sum
        FROM (SELECT user_id, event_id, ts, value
              FROM sq_sqov_events_{k}
              WHERE event_type = 'purchase') AS p
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlsqov_{k}", "append")
    return drained.select(
        "user_id", "event_id", "buy_cnt",
        F.round("buy_sum", 2).alias("buy_sum"),
    )


@query(
    "stream_sql_over_leadlag_drain",
    oracle="""
    SELECT user_id, event_id,
           round(lag(value, 1) OVER w, 2) AS prev_v,
           round(lag(value, 2) OVER w, 2) AS prev2_v,
           round(first_value(value) OVER w, 2) AS first_v,
           round(last_value(value) OVER w, 2) AS last_v,
           round(sum(value) OVER w, 2) AS running_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("streaming", "over", "sql-surface"),
)
def stream_sql_over_leadlag_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset/value aggregates in streaming OVER SQL (VERDICT r9 #3):
    LAG at two offsets, FIRST_VALUE, LAST_VALUE and a plain SUM share
    ONE window spec — the reference plans them all in a single
    StreamExecOverAggregate node (LeadLagAggFunction.java /
    FirstValueAggFunction.java under StreamExecOverAggregate.java:91);
    here they ride the same per-key running-state pass
    (streaming_over_multi: per-column lag tails + first/last
    accumulators + cumsum, all vectorized). LAG is NULL before enough
    rows exist (SQL default); ts is unique per user, so every value is
    tie-free on both engines."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ovll_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, event_id,
               LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS prev_v,
               LAG(value, 2) OVER (PARTITION BY user_id ORDER BY ts) AS prev2_v,
               FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts) AS first_v,
               LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts) AS last_v,
               SUM(value) OVER (PARTITION BY user_id ORDER BY ts) AS running_sum
        FROM sq_ovll_events_{k}
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlovll_{k}", "append")
    return drained.select(
        "user_id", "event_id",
        F.round("prev_v", 2).alias("prev_v"),
        F.round("prev2_v", 2).alias("prev2_v"),
        F.round("first_v", 2).alias("first_v"),
        F.round("last_v", 2).alias("last_v"),
        F.round("running_sum", 2).alias("running_sum"),
    )


@query(
    "stream_sql_window_topn_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    ranked AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             event_type, user_id, event_id, round(value, 2) AS value,
             -- rank on the RAW value (the operator compares raw doubles;
             -- parquet-identical on both engines) — rounding is display-only
             row_number() OVER (
               PARTITION BY time_bucket(INTERVAL '1 hour', ts), event_type
               ORDER BY events.value DESC, user_id DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT window_start, window_end, event_type, user_id, event_id, value, rn
    FROM ranked, wm WHERE rn <= 2 AND window_end <= wm.w
    """,
    tags=("streaming", "topn", "window", "sql-surface"),
)
def stream_sql_window_topn_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOW TOP-N as streaming SQL TEXT (VERDICT r9 #4 — previously
    rejected with a window_topn pointer): ROW_NUMBER partitioned by
    window_start, window_end (+ event_type) over a TUMBLE TVF, bounded
    by rn <= 2 — the reference's StreamExecWindowRank.java:77 pattern
    (window-topn.md), lowered onto streaming.windows.window_topn
    (top-k per closed window; append mode; state RANK-BOUNDED at k
    rows per (window, keys) like the reference's TopNBuffer —
    VERDICT r10 #3). Ties in value break by the payload columns
    DESCENDING with the rank order (the tuple-compare merge) — the
    oracle mirrors that tie-break; emitted set = windows closed by
    the final watermark."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_wtn_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT window_start, window_end, event_type, user_id, event_id,
               value, rn
        FROM (
          SELECT window_start, window_end, event_type, user_id, event_id,
                 value,
                 ROW_NUMBER() OVER (PARTITION BY window_start, window_end,
                     event_type ORDER BY value DESC) AS rn
          FROM TABLE(TUMBLE(TABLE sq_wtn_events_{k}, DESCRIPTOR(ts),
                            INTERVAL '1' HOUR))
        ) WHERE rn <= 2
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlwtn_{k}", "append")
    return drained.select(
        "window_start", "window_end", "event_type", "user_id", "event_id",
        F.round("value", 2).alias("value"), "rn",
    )


@query(
    "stream_sql_statement_set_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    clicks AS (
      SELECT user_id, count(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    purch AS (
      SELECT user_id,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
               AS window_end,
             count(*) AS n_purchases,
             round(sum(value), 2) AS purchase_total
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, time_bucket(INTERVAL '1 hour', ts)
    )
    SELECT c.user_id, c.n_clicks, p.window_start, p.window_end,
           p.n_purchases, p.purchase_total
    FROM clicks c JOIN purch p ON c.user_id = p.user_id
    WHERE p.window_end <= (SELECT w FROM wm)
    """,
    tags=("streaming", "statement-set", "sql-surface"),
)
def stream_sql_statement_set_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING statement set (VERDICT r9 #8 —
    StreamStatementSetImpl.java): two INSERTs reading the SAME events
    source drain as ONE streaming job; the shared scan is structural
    (a single readStream + foreachBatch persisting each micro-batch,
    both sinks planned over the persisted frame — the Spark analog of
    the reference's common-subgraph reuse). Sink A takes the click
    projection; sink B a per-(user, 1h-TUMBLE-window) purchase
    aggregate that the set executor emits ONLY when the running
    watermark closes the window (VERDICT r10 #2 — a non-windowed
    aggregate would append one partial row per micro-batch and is now
    rejected at add time), so every sink-B row is a complete window
    regardless of how many batches the drain takes. The result joins
    both sinks back, proving each received its statement's rows; the
    execute() receipt pins streaming_queries == 1."""
    import os as _os
    import tempfile as _tf

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_sset_ev_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    d = _tf.mkdtemp(prefix="spark_graft_sset_q_")
    clicks_dir = _os.path.join(d, "clicks")
    purch_dir = _os.path.join(d, "purch")
    t.execute_sql(
        f"CREATE TABLE sq_sset_clicks_{k} WITH ('connector'='filesystem',"
        f"'path'='{clicks_dir}','format'='parquet')"
    )
    t.execute_sql(
        f"CREATE TABLE sq_sset_purch_{k} WITH ('connector'='filesystem',"
        f"'path'='{purch_dir}','format'='parquet')"
    )
    receipt = (
        t.create_stream_statement_set()
        .add_insert_sql(
            f"INSERT INTO sq_sset_clicks_{k} "
            f"SELECT event_id, user_id FROM sq_sset_ev_{k} "
            f"WHERE event_type = 'click'"
        )
        .add_insert_sql(
            f"INSERT INTO sq_sset_purch_{k} "
            f"SELECT user_id, window_start, window_end, "
            f"COUNT(*) AS n_purchases, "
            f"ROUND(SUM(value), 2) AS purchase_total "
            f"FROM TABLE(TUMBLE(TABLE sq_sset_ev_{k}, DESCRIPTOR(ts), "
            f"INTERVAL '1' HOUR)) "
            f"WHERE event_type = 'purchase' "
            f"GROUP BY user_id, window_start, window_end"
        )
        .execute()
    )
    assert receipt["streaming_queries"] == 1 and receipt["statements"] == 2
    assert receipt["window_agg_statements"] == 1
    clicks = (
        spark.read.parquet(clicks_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    purch = spark.read.parquet(purch_dir)
    return clicks.join(purch, "user_id").select(
        "user_id", "n_clicks", "window_start", "window_end", "n_purchases",
        F.round("purchase_total", 2).alias("purchase_total"),
    )


@query(
    "stream_sql_statement_set_exec_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    win AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
               AS window_end,
             CAST(count(*) AS BIGINT) AS n
      FROM events
      GROUP BY event_type, time_bucket(INTERVAL '1 hour', ts)
    )
    SELECT event_type, window_start, window_end, n FROM win
    WHERE window_end <= (SELECT w FROM wm)
    """,
    tags=("streaming", "statement-set", "sql-surface"),
)
def stream_sql_statement_set_exec_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text ``EXECUTE STATEMENT SET BEGIN ... END`` driving the
    STREAMING multi-sink executor (VERDICT r10 next #5 —
    SqlStatementSet.java:41 works identically in streaming mode via
    StreamStatementSetImpl.java): both INSERTs read the same
    watermarked DDL source, so execute_sql routes the set to
    create_stream_statement_set() instead of the batch
    common-subgraph set — the receipt row pins streaming_queries == 1
    (the provably-shared scan) and window_agg_statements == 1 (the
    TUMBLE aggregate emits only watermark-closed windows). Sink A
    (click projection) is verified in-function against the batch
    count; the returned frame is sink B's closed-window census."""
    import os as _os
    import tempfile as _tf

    from flink_1_16_0_src_spark.session import TableEnvironment
    from flink_1_16_0_src_spark.tables import load

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ssx_ev_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    d = _tf.mkdtemp(prefix="spark_graft_ssx_")
    clicks_dir = _os.path.join(d, "clicks")
    win_dir = _os.path.join(d, "win")
    t.execute_sql(
        f"CREATE TABLE sq_ssx_clicks_{k} WITH ('connector'='filesystem',"
        f"'path'='{clicks_dir}','format'='parquet')"
    )
    t.execute_sql(
        f"CREATE TABLE sq_ssx_win_{k} WITH ('connector'='filesystem',"
        f"'path'='{win_dir}','format'='parquet')"
    )
    receipt = t.execute_sql(
        f"EXECUTE STATEMENT SET BEGIN "
        f"INSERT INTO sq_ssx_clicks_{k} SELECT event_id, user_id "
        f"FROM sq_ssx_ev_{k} WHERE event_type = 'click'; "
        f"INSERT INTO sq_ssx_win_{k} SELECT event_type, window_start, "
        f"window_end, COUNT(*) AS n "
        f"FROM TABLE(TUMBLE(TABLE sq_ssx_ev_{k}, DESCRIPTOR(ts), "
        f"INTERVAL '1' HOUR)) "
        f"GROUP BY event_type, window_start, window_end; "
        f"END"
    ).collect()[0]
    assert receipt.streaming_queries == 1 and receipt.statements == 2
    assert receipt.window_agg_statements == 1
    n_clicks = spark.read.parquet(clicks_dir).count()
    expect = load(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    ).count()
    assert n_clicks == expect, (n_clicks, expect)
    return spark.read.parquet(win_dir).select(
        "event_type", "window_start", "window_end", "n"
    )


@query(
    "stream_sql_statement_set_hop_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    hop AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - (INTERVAL '30 minutes' * g.i) AS window_start,
             value
      FROM events, (SELECT 0 AS i UNION ALL SELECT 1) g
      WHERE event_type = 'purchase'
    )
    SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
    FROM hop
    GROUP BY window_start
    HAVING window_start + INTERVAL '1 hour' <= (SELECT w FROM wm)
    """,
    tags=("streaming", "statement-set", "sql-surface"),
)
def stream_sql_statement_set_hop_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP window aggregate inside a STREAMING statement set (r11 —
    the reference's StreamStatementSetImpl runs any window kind; here
    multi-window rows stage until their LAST covering window closes
    and emission post-filters planned output on window_end, so every
    1h/30m-slide window emits exactly once with its complete row set
    whatever the batch boundaries). Oracle: each purchase contributes
    to its two covering hop windows (30-minute grid), gated at the
    final watermark."""
    import os as _os
    import tempfile as _tf

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ssh_ev_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    d = _os.path.join(_tf.mkdtemp(prefix="spark_graft_ssh_"), "win")
    t.execute_sql(
        f"CREATE TABLE sq_ssh_win_{k} WITH ('connector'='filesystem',"
        f"'path'='{d}','format'='parquet')"
    )
    receipt = (
        t.create_stream_statement_set()
        .add_insert_sql(
            f"INSERT INTO sq_ssh_win_{k} SELECT window_start, window_end, "
            f"COUNT(*) AS n, ROUND(SUM(value), 2) AS total "
            f"FROM TABLE(HOP(TABLE sq_ssh_ev_{k}, DESCRIPTOR(ts), "
            f"INTERVAL '30' MINUTE, INTERVAL '1' HOUR)) "
            f"WHERE event_type = 'purchase' "
            f"GROUP BY window_start, window_end"
        )
        .execute()
    )
    assert receipt["streaming_queries"] == 1
    assert receipt["window_agg_statements"] == 1
    return spark.read.parquet(d).select(
        "window_start", "window_end", "n", F.round("total", 2).alias("total")
    )


@query(
    "stream_sql_statement_set_cumacc_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    base AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS span, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS vi
      FROM events WHERE event_type = 'click'
    ),
    expl AS (
      SELECT span AS window_start,
             span + (INTERVAL '30 minutes' * g.j) AS window_end,
             event_id, vi
      FROM base, (SELECT 1 AS j UNION ALL SELECT 2) g
      WHERE span + (INTERVAL '30 minutes' * g.j) > ts
    )
    SELECT window_start, window_end,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(vi) AS BIGINT) AS cents,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id,
           CAST(sum(vi) AS DOUBLE) / count(*) AS avg_cents
    FROM expl
    GROUP BY window_start, window_end
    HAVING window_end <= (SELECT w FROM wm)
    """,
    tags=("streaming", "statement-set", "sql-surface"),
)
def stream_sql_statement_set_cumacc_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE window aggregate inside a streaming statement set on
    the r12 PARTIAL-ACCUMULATOR path: the SELECT list decomposes
    (COUNT/SUM/MIN/MAX/AVG over expressions + bare window columns), so
    each batch stages one partial row per (window, keys) group —
    exploded per covering slice — and emission merges partials
    (AVG = sum+count pair) instead of re-planning raw rows
    (MiniBatchIncrementalGroupAggFunction.java contract). The query fn
    asserts the decomposition actually engaged. Oracle: each click
    contributes to its span's still-open slices (30-minute step,
    1-hour max), gated at the final watermark; integer cents keep
    SUM/AVG exact."""
    import os as _os
    import tempfile as _tf

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ssc_ev_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    d = _os.path.join(_tf.mkdtemp(prefix="spark_graft_ssc_"), "win")
    t.execute_sql(
        f"CREATE TABLE sq_ssc_win_{k} WITH ('connector'='filesystem',"
        f"'path'='{d}','format'='parquet')"
    )
    ss = t.create_stream_statement_set().add_insert_sql(
        f"INSERT INTO sq_ssc_win_{k} SELECT window_start, window_end, "
        f"COUNT(*) AS n, "
        f"SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents, "
        f"MIN(event_id) AS min_id, MAX(event_id) AS max_id, "
        f"AVG(CAST(ROUND(value * 100) AS BIGINT)) AS avg_cents "
        f"FROM TABLE(CUMULATE(TABLE sq_ssc_ev_{k}, DESCRIPTOR(ts), "
        f"INTERVAL '30' MINUTE, INTERVAL '1' HOUR)) "
        f"WHERE event_type = 'click' "
        f"GROUP BY window_start, window_end"
    )
    assert ss._inserts[0][5]["acc"] is not None, "acc path must engage"
    receipt = ss.execute()
    assert receipt["window_agg_statements"] == 1
    return spark.read.parquet(d).select(
        "window_start", "window_end", "n", "cents", "min_id", "max_id",
        "avg_cents",
    )


@query(
    "stream_sql_statement_set_topn_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    base AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
                 AS window_end,
             event_id, user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS vi
      FROM events WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY window_start, window_end
                                   ORDER BY vi DESC, event_id) AS rn
      FROM base
    )
    SELECT window_start, window_end, event_id, user_id, vi,
           CAST(rn AS BIGINT) AS rn
    FROM ranked
    WHERE rn <= 3 AND window_end <= (SELECT w FROM wm)
    """,
    tags=("streaming", "statement-set", "rank", "sql-surface"),
)
def stream_sql_statement_set_topn_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window Top-N inside a streaming statement set (r12): ROW_NUMBER()
    OVER (PARTITION BY window_start, window_end ORDER BY cents DESC,
    event_id) with an rn <= 3 filter — the reference's
    window-rank-after-window-TVF statement-set pattern
    (WindowRankProcessor.java; window-topn.md "Window Top-N follows
    after Window TVF"). Admission requires every OVER to partition by
    (window_start, window_end); raw-row staging then plans each window
    ONCE over its complete row set, so the rank is exact without
    cross-batch rank state. Integer cents + the unique event_id
    tiebreak keep the rank deterministic on both engines; the oracle
    gates windows at the final watermark."""
    import os as _os
    import tempfile as _tf

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_sst_ev_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    d = _os.path.join(_tf.mkdtemp(prefix="spark_graft_sst_"), "topn")
    t.execute_sql(
        f"CREATE TABLE sq_sst_topn_{k} WITH ('connector'='filesystem',"
        f"'path'='{d}','format'='parquet')"
    )
    ss = t.create_stream_statement_set().add_insert_sql(
        f"INSERT INTO sq_sst_topn_{k} "
        f"SELECT window_start, window_end, event_id, user_id, vi, "
        f"CAST(rn AS BIGINT) AS rn FROM ("
        f"SELECT window_start, window_end, event_id, user_id, "
        f"CAST(ROUND(value * 100) AS BIGINT) AS vi, "
        f"ROW_NUMBER() OVER (PARTITION BY window_start, window_end "
        f"ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC, event_id) AS rn "
        f"FROM TABLE(TUMBLE(TABLE sq_sst_ev_{k}, DESCRIPTOR(ts), "
        f"INTERVAL '1' HOUR)) WHERE event_type = 'click'"
        f") WHERE rn <= 3"
    )
    receipt = ss.execute()
    assert receipt["window_agg_statements"] == 1
    return spark.read.parquet(d).select(
        "window_start", "window_end", "event_id", "user_id", "vi", "rn"
    )


@query(
    "stream_sql_statement_set_dedup_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    base AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
                 AS window_end,
             event_id, user_id, ts
      FROM events WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY window_start, window_end, user_id
        ORDER BY ts, event_id) AS rn
      FROM base
    )
    SELECT window_start, window_end, user_id, event_id
    FROM ranked
    WHERE rn = 1 AND window_end <= (SELECT w FROM wm)
    """,
    tags=("streaming", "statement-set", "dedup", "sql-surface"),
)
def stream_sql_statement_set_dedup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINDOW DEDUPLICATION inside a streaming statement set (r12): the
    reference's window-deduplication.md pattern — ROW_NUMBER() OVER
    (PARTITION BY window_start, window_end, user_id ORDER BY ts) with
    rn = 1 keeps each user's FIRST click per hour window
    (WindowDeduplicateOperator / the rank special case with k=1).
    Rides the same window-scoped OVER admission as window Top-N: each
    window plans once, complete, so the keep-first pick is exact across
    micro-batches. (user_id, ts) is unique at every SF (fixture
    contract) and event_id breaks any residual tie deterministically."""
    import os as _os
    import tempfile as _tf

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ssd_ev_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    d = _os.path.join(_tf.mkdtemp(prefix="spark_graft_ssd_"), "dedup")
    t.execute_sql(
        f"CREATE TABLE sq_ssd_out_{k} WITH ('connector'='filesystem',"
        f"'path'='{d}','format'='parquet')"
    )
    ss = t.create_stream_statement_set().add_insert_sql(
        f"INSERT INTO sq_ssd_out_{k} "
        f"SELECT window_start, window_end, user_id, event_id FROM ("
        f"SELECT window_start, window_end, user_id, event_id, "
        f"ROW_NUMBER() OVER (PARTITION BY window_start, window_end, "
        f"user_id ORDER BY ts, event_id) AS rn "
        f"FROM TABLE(TUMBLE(TABLE sq_ssd_ev_{k}, DESCRIPTOR(ts), "
        f"INTERVAL '1' HOUR)) WHERE event_type = 'click'"
        f") WHERE rn = 1"
    )
    receipt = ss.execute()
    assert receipt["window_agg_statements"] == 1
    return spark.read.parquet(d).select(
        "window_start", "window_end", "user_id", "event_id"
    )


@query(
    "stream_sql_statement_set_dim_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    win AS (
      SELECT c.c_nationkey AS nation,
             time_bucket(INTERVAL '1 hour', e.ts) AS window_start,
             time_bucket(INTERVAL '1 hour', e.ts) + INTERVAL '1 hour'
               AS window_end,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(e.value), 2) AS total
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.event_type = 'purchase'
      GROUP BY c.c_nationkey, time_bucket(INTERVAL '1 hour', e.ts)
    )
    SELECT nation, window_start, window_end, n, total FROM win
    WHERE window_end <= (SELECT w FROM wm)
    """,
    tags=("streaming", "statement-set", "sql-surface"),
)
def stream_sql_statement_set_dim_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream x batch-DIM enrichment inside a streaming statement set
    (r11): the watermarked events source is the stream; the customer
    DDL table is a batch dimension resolving through its batch view in
    the per-batch planning — here under a watermark-closed TUMBLE
    aggregate (per-nation hourly purchase census), the canonical
    enrichment-then-window production shape. The receipt pins the
    shared scan; every emitted row is a complete closed window."""
    import os as _os
    import tempfile as _tf

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_ssd_ev_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    t.execute_sql(
        f"CREATE TABLE sq_ssd_cust_{k}"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'customer.parquet')}',"
        f"'format'='parquet')"
    )
    d = _os.path.join(_tf.mkdtemp(prefix="spark_graft_ssd_"), "win")
    t.execute_sql(
        f"CREATE TABLE sq_ssd_win_{k} WITH ('connector'='filesystem',"
        f"'path'='{d}','format'='parquet')"
    )
    receipt = (
        t.create_stream_statement_set()
        .add_insert_sql(
            f"INSERT INTO sq_ssd_win_{k} SELECT c.c_nationkey AS nation, "
            f"window_start, window_end, COUNT(*) AS n, "
            f"ROUND(SUM(e.value), 2) AS total "
            f"FROM TABLE(TUMBLE(TABLE sq_ssd_ev_{k}, DESCRIPTOR(ts), "
            f"INTERVAL '1' HOUR)) e "
            f"JOIN sq_ssd_cust_{k} c ON e.user_id = c.c_custkey "
            f"WHERE e.event_type = 'purchase' "
            f"GROUP BY c.c_nationkey, window_start, window_end"
        )
        .execute()
    )
    assert receipt["shared_source"] == f"sq_ssd_ev_{k}"
    assert receipt["window_agg_statements"] == 1
    return spark.read.parquet(d).select(
        "nation", "window_start", "window_end", "n",
        F.round("total", 2).alias("total"),
    )


@query(
    "stream_sql_statement_set_session_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    b AS (
      SELECT user_id, ts, event_type, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts)
                          > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    s AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM b
    ),
    w AS (
      SELECT user_id, event_type, value,
             min(ts) OVER (PARTITION BY user_id, sid) AS window_start,
             max(ts) OVER (PARTITION BY user_id, sid)
               + INTERVAL '30 minutes' AS window_end
      FROM s
    )
    SELECT user_id, window_start, window_end,
           CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
    FROM w
    WHERE event_type = 'purchase'
      AND window_end <= (SELECT w FROM wm)
    GROUP BY user_id, window_start, window_end
    """,
    tags=("streaming", "statement-set", "sql-surface"),
)
def stream_sql_statement_set_session_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SESSION window aggregate inside a STREAMING statement set (r11
    — merging windows under the staging model: session assignment is
    recomputed over staged ∪ new rows each batch and a session emits
    once, complete, when the watermark passes max(ts)+gap; the
    reference's StreamStatementSetImpl.java runs merging windows the
    same way via WindowOperator purge-on-fire). Per-user 30-minute
    activity sessions; the WHERE filters purchases AFTER session
    assignment (TVF semantics), so session bounds derive from ALL the
    user's events. Oracle replays gaps-and-islands per user, gated at
    the final watermark."""
    import os as _os
    import tempfile as _tf

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_sss_ev_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    d = _os.path.join(_tf.mkdtemp(prefix="spark_graft_sss_"), "win")
    t.execute_sql(
        f"CREATE TABLE sq_sss_win_{k} WITH ('connector'='filesystem',"
        f"'path'='{d}','format'='parquet')"
    )
    receipt = (
        t.create_stream_statement_set()
        .add_insert_sql(
            f"INSERT INTO sq_sss_win_{k} SELECT user_id, window_start, "
            f"window_end, COUNT(*) AS n, ROUND(SUM(value), 2) AS total "
            f"FROM TABLE(SESSION(TABLE sq_sss_ev_{k} "
            f"PARTITION BY user_id, DESCRIPTOR(ts), "
            f"INTERVAL '30' MINUTE)) "
            f"WHERE event_type = 'purchase' "
            f"GROUP BY user_id, window_start, window_end"
        )
        .execute()
    )
    assert receipt["streaming_queries"] == 1
    assert receipt["window_agg_statements"] == 1
    return spark.read.parquet(d).select(
        "user_id", "window_start", "window_end", "n",
        F.round("total", 2).alias("total"),
    )


@query(
    "stream_sql_statement_set_multisrc_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    win AS (
      SELECT event_type AS et,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
               AS window_end,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(value), 2) AS total
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY event_type, time_bucket(INTERVAL '1 hour', ts)
    )
    SELECT et, window_end, n, total FROM win
    WHERE window_end <= (SELECT w FROM wm)
    """,
    tags=("streaming", "statement-set", "sql-surface"),
)
def stream_sql_statement_set_multisrc_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Statement set spanning TWO streaming sources (r11): the
    reference's StreamStatementSetImpl accepts INSERTs over any mix of
    sources — common-subgraph sharing merges only identical scans, so
    distinct sources are distinct subgraphs of the one job. Here two
    DDL tables (both over the events fixture) each feed a TUMBLE
    census (purchases / clicks); the receipt pins one streaming query
    PER SOURCE (streaming_queries == 2) and both drains stay
    watermark-gated. Output unions the two sinks under an ``et`` tag;
    the oracle replays both censuses in one grouped scan."""
    import os as _os
    import tempfile as _tf

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    sinks = {}
    for tag, et in (("p", "purchase"), ("c", "click")):
        t.execute_sql(
            f"CREATE TABLE sq_ssm_{tag}_{k} (event_id BIGINT,"
            f" ts TIMESTAMP(3), user_id BIGINT, event_type STRING,"
            f" value DOUBLE,"
            f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
            f" WITH ('connector'='filesystem',"
            f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
            f"'format'='parquet')"
        )
        sinks[tag] = _os.path.join(
            _tf.mkdtemp(prefix="spark_graft_ssm_"), "win"
        )
        t.execute_sql(
            f"CREATE TABLE sq_ssm_w_{tag}_{k}"
            f" WITH ('connector'='filesystem','path'='{sinks[tag]}',"
            f"'format'='parquet')"
        )
    receipt = (
        t.create_stream_statement_set()
        .add_insert_sql(
            f"INSERT INTO sq_ssm_w_p_{k} SELECT window_end, "
            f"COUNT(*) AS n, ROUND(SUM(value), 2) AS total "
            f"FROM TABLE(TUMBLE(TABLE sq_ssm_p_{k}, DESCRIPTOR(ts), "
            f"INTERVAL '1' HOUR)) WHERE event_type = 'purchase' "
            f"GROUP BY window_start, window_end"
        )
        .add_insert_sql(
            f"INSERT INTO sq_ssm_w_c_{k} SELECT window_end, "
            f"COUNT(*) AS n, ROUND(SUM(value), 2) AS total "
            f"FROM TABLE(TUMBLE(TABLE sq_ssm_c_{k}, DESCRIPTOR(ts), "
            f"INTERVAL '1' HOUR)) WHERE event_type = 'click' "
            f"GROUP BY window_start, window_end"
        )
        .execute()
    )
    assert receipt["streaming_queries"] == 2
    assert receipt["window_agg_statements"] == 2
    out = None
    for tag, et in (("p", "purchase"), ("c", "click")):
        part = spark.read.parquet(sinks[tag]).select(
            F.lit(et).alias("et"), "window_end", "n",
            F.round("total", 2).alias("total"),
        )
        out = part if out is None else out.unionByName(part)
    return out


@query(
    "stream_sql_view_topn_drain",
    oracle="""
    SELECT user_id, event_id, value, rn FROM (
      SELECT user_id, event_id, round(value, 2) AS value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ) WHERE rn <= 2
    """,
    tags=("streaming", "composition", "topn", "sql-surface"),
)
def stream_sql_view_topn_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition form 3 (VERDICT r9 #2): a STREAMING VIEW (filter
    pipeline) feeding the canonical continuous Top-N statement — the
    row_number-filter pattern's subquery reads the registered view, so
    filter → rank composes across two statements exactly like the
    reference's view expansion (StreamExecRank over a Calc sub-graph).
    Update-mode drain: the sink holds the final top-2 per user — the
    two most RECENT purchases (rank by ts DESC, the keep-last-N
    pattern); (user_id, ts) is unique at every SF, so the rank is
    tie-free on both engines (ranking by value would tie at 2 dp)."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_vtn_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    t.create_streaming_view(f"sq_vtn_purch_{k}", f"""
        SELECT user_id, event_id, ts, ROUND(value, 2) AS value
        FROM sq_vtn_events_{k} WHERE event_type = 'purchase'
    """)
    out = t.stream_query(f"""
        SELECT user_id, event_id, value, rn FROM (
          SELECT user_id, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC) AS rn
          FROM sq_vtn_purch_{k}
        ) WHERE rn <= 2
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlvtn_{k}", "update")
    return drained.select("user_id", "event_id", "value", "rn")


@query(
    "stream_sql_group_agg_having_drain",
    oracle="""
    SELECT user_id, event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM events
    GROUP BY user_id, event_type
    HAVING count(*) >= 3
    """,
    tags=("streaming", "agg", "sql-surface"),
)
def stream_sql_group_agg_having_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous streaming GROUP BY with a HAVING gate as SQL TEXT
    (StreamExecGroupAggregate + the Calc the reference plans above it):
    the post-aggregate filter streams in update mode — keys whose
    running count has not reached the gate are absent from the sink
    after the availableNow drain, matching the batch HAVING oracle."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_gah_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT user_id, event_type, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total
        FROM sq_gah_events_{k}
        GROUP BY user_id, event_type
        HAVING COUNT(*) >= 3
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlgah_{k}", "update")
    return drained.select("user_id", "event_type", "n", "total")


@query(
    "stream_sql_window_topn_hop_drain",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    hopped AS (
      SELECT time_bucket(INTERVAL '30 minutes', e.ts)
               - (j.j * INTERVAL '30 minutes') AS window_start,
             time_bucket(INTERVAL '30 minutes', e.ts)
               - (j.j * INTERVAL '30 minutes') + INTERVAL '1 hour' AS window_end,
             e.user_id, e.event_id, round(e.value, 2) AS value,
             e.value AS raw_value
      FROM events e, generate_series(0, 1) j(j)
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY window_start
               ORDER BY raw_value DESC, user_id DESC, event_id DESC) AS rn
      FROM hopped
    )
    SELECT window_start, window_end, user_id, event_id, value, rn
    FROM ranked, wm WHERE rn <= 3 AND window_end <= wm.w
    """,
    tags=("streaming", "topn", "window", "sql-surface"),
)
def stream_sql_window_topn_hop_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP-window Top-N as streaming SQL (StreamExecWindowRank runs on
    any window kind — window-topn.md's hopping example): top-3 rows per
    sliding 1-hour window (slide 30 min, each row ranks in 2 windows).
    Same lowering as the TUMBLE form with the spec's slide re-windowing
    the raw stream; ties break by payload DESC (oracle mirrors);
    emitted set = windows closed by the final watermark."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_wtnh_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT window_start, window_end, user_id, event_id, value, rn
        FROM (
          SELECT window_start, window_end, user_id, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY window_start, window_end
                     ORDER BY value DESC) AS rn
          FROM TABLE(HOP(TABLE sq_wtnh_events_{k}, DESCRIPTOR(ts),
                         INTERVAL '30' MINUTE, INTERVAL '1' HOUR))
        ) WHERE rn <= 3
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlwtnh_{k}", "append")
    return drained.select(
        "window_start", "window_end", "user_id", "event_id",
        F.round("value", 2).alias("value"), "rn",
    )


@query(
    "stream_sql_grouping_sets_drain",
    oracle="""
    SELECT event_type, user_id % 3 AS ub, count(*) AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY GROUPING SETS ((event_type), (event_type, user_id % 3), ())
    """,
    tags=("streaming", "agg", "grouping-sets", "sql-surface"),
)
def stream_sql_grouping_sets_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over a continuous streaming aggregate as SQL TEXT
    (the reference plans StreamExecExpand under
    StreamExecGroupAggregate for streaming grouping sets — Spark's
    Expand + update-mode stateful agg is the same shape): three
    grouping sets (type, type x user-bucket, grand total) drain in
    UPDATE mode; the sink's final value per expanded key equals the
    batch grouping-sets oracle."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_gs_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT event_type, user_id % 3 AS ub, COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total
        FROM sq_gs_events_{k}
        GROUP BY GROUPING SETS ((event_type), (event_type, user_id % 3), ())
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlgs_{k}", "update")
    return drained.select("event_type", "ub", "n", "total")


@query(
    "stream_sql_union_agg_drain",
    oracle="""
    WITH u AS (
      SELECT user_id, value FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, value FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
    FROM u GROUP BY user_id
    """,
    tags=("streaming", "setop", "agg", "sql-surface"),
)
def stream_sql_union_agg_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two STREAMING relations feeding one continuous
    aggregate, all in a single statement (StreamExecUnion under
    StreamExecGroupAggregate — the fan-in every multi-topic ingestion
    job starts with): both DDL tables resolve to streaming frames
    inside stream_query, Spark plans the streaming union natively, and
    the update-mode drain's final per-key values equal the batch
    oracle."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    for side in ("l", "r"):
        t.execute_sql(
            f"CREATE TABLE sq_un_{side}_{k} (event_id BIGINT, ts TIMESTAMP(3),"
            f" user_id BIGINT, event_type STRING, value DOUBLE)"
            f" WITH ('connector'='filesystem',"
            f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
            f"'format'='parquet')"
        )
    out = t.stream_query(f"""
        SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
        FROM (
          SELECT user_id, value FROM sq_un_l_{k} WHERE event_type = 'click'
          UNION ALL
          SELECT user_id, value FROM sq_un_r_{k} WHERE event_type = 'purchase'
        ) u
        GROUP BY user_id
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlun_{k}", "update")
    return drained.select("user_id", "n", "total")


@query(
    "stream_sql_view_match_drain",
    oracle="""
    WITH busy AS (
      SELECT user_id, ts, event_id, event_type FROM events WHERE value > 5
    )
    SELECT user_id, click_id, purchase_id FROM (
      SELECT user_id,
             event_id AS click_id,
             lead(event_id) OVER w AS purchase_id,
             event_type,
             lead(event_type) OVER w AS next_type
      FROM busy
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) t
    WHERE event_type = 'click' AND next_type = 'purchase'
    """,
    tags=("streaming", "cep", "composition", "sql-surface"),
)
def stream_sql_view_match_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition form 4: a STREAMING VIEW (value filter) feeding
    streaming MATCH_RECOGNIZE — the Calc-under-Match plan the reference
    builds when a view wraps the CEP source (StreamExecMatch over
    StreamExecCalc). The filter changes which rows are ADJACENT, so the
    pattern genuinely runs over the composed relation, not the raw
    table; strict (A B) adjacency with SKIP PAST LAST ROW equals the
    batch lead() rewrite over the same filtered corpus."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_vm_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    t.create_streaming_view(f"sq_vm_busy_{k}", f"""
        SELECT user_id, ts, event_id, event_type
        FROM sq_vm_events_{k} WHERE value > 5
    """)
    out = t.stream_query(f"""
        SELECT * FROM sq_vm_busy_{k} MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES A.event_id AS click_id, B.event_id AS purchase_id
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B)
          DEFINE A AS A.event_type = 'click', B AS B.event_type = 'purchase'
        )
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlvm_{k}", "append")
    return drained.select("user_id", "click_id", "purchase_id")


@query(
    "stream_sql_match_within_drain",
    oracle="""
    SELECT user_id, click_id, purchase_id FROM (
      SELECT user_id,
             event_id AS click_id,
             lead(event_id) OVER w AS purchase_id,
             ts,
             lead(ts) OVER w AS next_ts,
             event_type,
             lead(event_type) OVER w AS next_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) t
    WHERE event_type = 'click' AND next_type = 'purchase'
      AND next_ts <= ts + INTERVAL '30 minutes'
    """,
    tags=("streaming", "cep", "match-recognize", "sql-surface"),
)
def stream_sql_match_within_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATCH_RECOGNIZE with the WITHIN clause (Flink's
    SqlMatchRecognize extension — CepOperator arms a match-lifetime
    timer; matches exceeding the interval are pruned): the (A B)
    adjacency pattern only matches when the purchase lands within 30
    minutes of the click, so the drained set is the batch lead()
    rewrite PLUS the time bound. The WITHIN pruning also bounds NFA
    state lifetime — the state-cleanup contract at scale."""
    import os as _os

    from flink_1_16_0_src_spark.session import TableEnvironment

    t = TableEnvironment(spark)
    k = next(_seq)
    t.execute_sql(
        f"CREATE TABLE sq_mw_events_{k} (event_id BIGINT, ts TIMESTAMP(3),"
        f" user_id BIGINT, event_type STRING, value DOUBLE,"
        f" WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE)"
        f" WITH ('connector'='filesystem',"
        f"'path'='{_os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet')"
    )
    out = t.stream_query(f"""
        SELECT * FROM sq_mw_events_{k} MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES A.event_id AS click_id, B.event_id AS purchase_id
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B) WITHIN INTERVAL '30' MINUTE
          DEFINE A AS A.event_type = 'click', B AS B.event_type = 'purchase'
        )
    """)
    drained = ssrc.run_to_memory(out, f"drain_sqlmw_{k}", "append")
    return drained.select("user_id", "click_id", "purchase_id")
