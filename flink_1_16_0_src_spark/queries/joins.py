"""Join operator family (SURVEY.md §2.4).

Reference parity:
- hash / sort-merge / nested-loop joins: EXEC-B/BatchExecHashJoin.java:55,
  BatchExecSortMergeJoin.java:55, BatchExecNestedLoopJoin.java:46 →
  Catalyst picks the physical strategy; broadcast hints where the dim
  side is small (checked via .explain: BroadcastHashJoin).
- join types: T-RUNTIME/operators/join/FlinkJoinType.java
  (INNER/LEFT/RIGHT/FULL/SEMI/ANTI).
- interval join: EXEC-S/StreamExecIntervalJoin.java:82.
- temporal/as-of join: EXEC-S/StreamExecTemporalJoin.java:77 → custom
  operators.joins.asof_join; oracle = DuckDB's native ASOF JOIN.
- lookup join: EXEC-S/StreamExecLookupJoin.java:56 → broadcast.

Scale notes: fact-side tables (lineitem/orders/events) shuffle on the
join key only where both sides are large; dims (region/nation/part/
supplier/customer) broadcast (<64 MB threshold set in session.py). The
as-of join is one shuffle + one per-key sort — no range cross-product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.operators.joins import asof_join, interval_join, lookup_join
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, round(o.o_totalprice, 2) AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("join",),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equi inner join orders x lineitem (BatchExecHashJoin.java:55 shape)."""
    o, c = load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .where(c.c_mktsegment == "BUILDING")
        .select("o_orderkey", "c_name", "c_mktsegment", F.round("o_totalprice", 2).alias("total"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           round(coalesce(o.o_totalprice, 0), 2) AS total
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with a join-side predicate (tests that the filter
    applies pre-join, not post — classic outer-join semantics trap)."""
    o, c = load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    return c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left").select(
        "c_custkey", "c_name", "o_orderkey", F.round(F.coalesce(o.o_totalprice, F.lit(0)), 2).alias("total")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n.n_name, s.s_name, round(s.s_acctbal, 2) AS bal
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join with nulls on the unmatched build side (FlinkJoinType RIGHT)."""
    s, n = load(spark, sf_dir, "supplier"), load(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "n_name", "s_name", F.round("s_acctbal", 2).alias("bal")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000),
         big_supp AS (SELECT s_suppkey, s_acctbal FROM supplier WHERE s_acctbal > 5000)
    SELECT c.c_custkey, s.s_suppkey,
           round(c.c_acctbal, 2) AS cust_bal, round(s.s_acctbal, 2) AS supp_bal
    FROM big_cust c FULL JOIN big_supp s ON c.c_custkey = s.s_suppkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — both sides null-padded (SortMergeJoinOperator full-outer iterators)."""
    c = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    s = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 5000).select("s_suppkey", "s_acctbal")
    return c.join(s, c.c_custkey == s.s_suppkey, "full").select(
        "c_custkey",
        "s_suppkey",
        F.round("c_acctbal", 2).alias("cust_bal"),
        F.round("s_acctbal", 2).alias("supp_bal"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left_semi (reference rewrites IN/EXISTS to semi join in
    subquery_rewrite phase, FlinkSubQueryRemoveRule.scala — Catalyst's
    RewritePredicateSubquery does the same)."""
    o, c = load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    big = o.where(F.col("o_totalprice") > 100000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left anti join (FlinkJoinType ANTI; customers with no orders)."""
    o, c = load(spark, sf_dir, "orders"), load(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_theta_nonequi",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    """,
    tags=("join",),
)
def join_theta_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (reference BatchExecNestedLoopJoin): equi-part hash,
    non-equi residual filter — Catalyst plans hash join + filter."""
    s, c = load(spark, sf_dir, "supplier"), load(spark, sf_dir, "customer")
    return s.join(
        c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal), "inner"
    ).select("s_suppkey", "s_name", "c_custkey")


@query(
    "join_multiway_q5",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("join", "tpch"),
)
def join_multiway_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — 6-table star join. Dims broadcast; lineitem and
    orders shuffle on their keys once (check .explain: 4 BroadcastHashJoin
    + 1 SortMergeJoin at scale)."""
    r = load(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    n, c = load(spark, sf_dir, "nation"), load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li, s = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "join_interval",
    oracle="""
    SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts + INTERVAL 1 SECOND
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
     AND a.event_type = 'signup' AND b.event_type = 'purchase'
    """,
    tags=("join", "interval"),
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (reference TimeIntervalJoin.java:485): purchases
    within (1s, 5min] after a signup by the same user."""
    ev = load(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "signup").alias("a")
    b = ev.where(F.col("event_type") == "purchase").alias("b")
    return interval_join(
        a,
        b,
        F.col("a.user_id") == F.col("b.user_id"),
        F.col("a.ts"),
        F.col("b.ts"),
        "1 SECOND",
        "5 MINUTE",
    ).select(
        F.col("a.event_id").alias("a_id"), F.col("b.event_id").alias("b_id"), F.col("a.user_id")
    )


@query(
    "join_asof_temporal",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey, round(o.o_totalprice, 2) AS last_order_price
    FROM events e
    ASOF LEFT JOIN (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                   ORDER BY o_orderkey DESC) = 1
    ) o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("join", "temporal"),
)
def join_asof_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal/as-of join (FOR SYSTEM_TIME AS OF, reference
    TemporalRowTimeJoinOperator.java): each event enriched with the
    user's most recent order at event time. Custom operator
    operators.joins.asof_join (union + per-key window — one shuffle)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # deterministic version stream: at equal o_orderdate keep max orderkey
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    o = o.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    joined = asof_join(
        ev.withColumnRenamed("user_id", "o_custkey"),
        o,
        on=["o_custkey"],
        left_time="ts",
        right_time="o_orderdate",
        how="left",
    )
    return joined.select(
        "event_id",
        F.col("o_custkey").alias("user_id"),
        "ts",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("last_order_price"),
    )


@query(
    "join_lookup_broadcast",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_type,
           round(l.l_extendedprice - p.p_retailprice, 2) AS price_delta
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 40
    """,
    tags=("join", "lookup"),
)
def join_lookup_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup join, in-catalog dim (reference LookupJoinRunner):
    broadcast hash join — the fact side never shuffles."""
    li, p = load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "part")
    return (
        lookup_join(li, p.where(F.col("p_size") >= 40), li.l_partkey == p.p_partkey, "inner")
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_brand",
            "p_type",
            F.round(F.col("l_extendedprice") - F.col("p_retailprice"), 2).alias("price_delta"),
        )
    )


@query(
    "join_range_bucketed",
    oracle="""
    SELECT p.p_partkey,
           count(*) AS n_in_band,
           round(sum(l.l_quantity), 2) AS qty_in_band
    FROM part p
    JOIN lineitem l
      ON (l.l_extendedprice / l.l_quantity) BETWEEN p.p_retailprice * 0.98
                                                AND p.p_retailprice * 1.02
    GROUP BY p.p_partkey
    """,
    tags=("join", "range", "custom-op"),
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (point-in-interval) executed as a bucketed EQUI-join
    (operators.joins.range_join) instead of the nested-loop plan the
    BETWEEN predicate would otherwise force — the scale path for
    non-equi joins. The oracle runs the plain BETWEEN join."""
    from flink_1_16_0_src_spark.operators.joins import range_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice") * 0.98).alias("lo"),
        (F.col("p_retailprice") * 1.02).alias("hi"),
    )
    joined = range_join(li, p, "unit_price", ("lo", "hi"), width=50.0)
    return joined.groupBy("p_partkey").agg(
        F.count("*").alias("n_in_band"),
        F.round(F.sum("l_quantity"), 2).alias("qty_in_band"),
    )


@query(
    "join_lookup_batched_probe",
    oracle="""
    SELECT c_custkey, c_name, n.n_name, n.n_regionkey
    FROM customer
    LEFT JOIN nation n ON c_nationkey = n_nationkey
    """,
    tags=("join", "lookup"),
)
def join_lookup_batched_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup join via the EXTERNAL-PROBE path (LookupJoinRunner.java:34
    — per-Arrow-batch distinct-key probe + worker cache), not the
    broadcast shortcut: the 'external system' here is a deterministic
    dict snapshot of the nation table shipped in the probe closure, so
    the mapInPandas probe/caching machinery is what's actually under
    test; a plain left join is the oracle."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from flink_1_16_0_src_spark.operators.lookup import lookup_join

    dim = {
        int(r.n_nationkey): {"n_name": r.n_name, "n_regionkey": int(r.n_regionkey)}
        for r in load(spark, sf_dir, "nation").collect()
    }

    def probe(keys):
        return {k: dim.get(k, {"n_name": None, "n_regionkey": None}) for k in keys}

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    out_schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    out = lookup_join(
        cust, probe, "c_nationkey", ["n_name", "n_regionkey"], out_schema,
        batch_size=64, cache=True, concurrency=2,
    )
    return out.select("c_custkey", "c_name", "n_name", "n_regionkey")


@query(
    "join_bucketed_exchange_free",
    oracle="""
    SELECT o.o_custkey,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_lineitems
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey
    """,
    tags=("join", "bucketing", "exchange-elimination"),
)
def join_bucketed_exchange_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (BatchExecExchange.java:65 FORWARD-
    instead-of-HASH when distributions already match): orders and
    lineitem are written bucketed+sorted on the join key once, then
    joined exchange-free — values must equal the plain join (the
    oracle); `tests/test_plans.py` separately asserts the zero-Exchange
    plan for this layout. NB counts count PAIRINGS (left join), so the
    oracle is layout-independent."""
    from flink_1_16_0_src_spark.operators.bucketing import bucketed_join, write_bucketed

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .withColumn("__lm", F.lit(1))
    )
    write_bucketed(o, "bq_orders", "o_orderkey", buckets=8)
    write_bucketed(l, "bq_lineitem", "o_orderkey", buckets=8)
    joined = bucketed_join(spark, "bq_orders", "bq_lineitem", "o_orderkey", "left_outer")
    return joined.groupBy("o_custkey").agg(
        F.count("*").alias("n_pairs"),
        F.count("__lm").alias("n_lineitems"),
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    tags=("join", "skew", "custom-op"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join (operators/skew.py `salted_join`,
    reference fallback: HashJoinOperator.java:260-267 hash→sort-merge
    spill): events salted 8 ways against the replicated customer dim,
    hot keys (user_id < 50) replicated per-salt and the cold remainder
    joined unsalted. The oracle is the PLAIN join aggregate — salting
    must be result-invariant; value sum in DECIMAL for hash parity."""
    from flink_1_16_0_src_spark.operators.skew import salted_join

    ev = load(spark, sf_dir, "events").select("user_id", "value")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    hot = ev.sparkSession.range(0, 50).select(F.col("id").alias("user_id"))
    joined = salted_join(ev, cust, "user_id", n_salts=8, hot_keys=hot)
    return joined.groupBy("c_nationkey").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
            "total_value"
        ),
    )
