"""Aggregate-library completions (SURVEY.md §2.3 function list tail):
JSON_OBJECTAGG / JSON_ARRAYAGG, SINGLE_VALUE, COLLECT (multiset), an
interval RANGE over-frame, and two more TPC-H join+agg shapes.

Reference parity:
- JSON_OBJECTAGG/JSON_ARRAYAGG: JsonObjectAggFunction.java /
  JsonArrayAggFunction.java — emitted here as canonical (key-sorted)
  JSON text so the DuckDB oracle hash-matches byte-for-byte.
- SINGLE_VALUE: SingleValueAggFunction.java — errors on >1 row per
  group at runtime in Flink; SQL can't throw, so the query exposes an
  ``is_single`` flag and nulls the value otherwise (documented delta).
- COLLECT: CollectAggFunction.java — multiset = value→count map,
  rendered as key-sorted JSON text for engine-independent comparison.
- RANGE interval frame: BatchExecOverAggregate.java frames
  (RangeBoundedPrecedingOverFrame) → rangeBetween on unix seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "agg_json_objectagg",
    oracle="""
    SELECT r_regionkey,
           '{' || string_agg('"' || n_name || '":' || n_nationkey, ',' ORDER BY n_name) || '}'
             AS nations_json
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_regionkey
    """,
    tags=("agg", "json"),
)
def agg_json_objectagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_OBJECTAGG(key: name VALUE nationkey) per region — canonical
    key-sorted serialization on both engines."""
    n, r = load(spark, sf_dir, "nation"), load(spark, sf_dir, "region")
    j = n.join(r, n.n_regionkey == r.r_regionkey)
    return (
        j.groupBy("r_regionkey")
        .agg(F.array_sort(F.collect_list(F.struct("n_name", "n_nationkey"))).alias("__entries"))
        .select(
            "r_regionkey",
            F.concat(
                F.lit("{"),
                F.array_join(F.transform(F.col("__entries"), lambda x: F.concat(
                    F.lit('"'), x["n_name"], F.lit('":'), x["n_nationkey"].cast("string")
                )), ","),
                F.lit("}"),
            ).alias("nations_json"),
        )
    )


@query(
    "agg_json_arrayagg",
    oracle="""
    SELECT n_regionkey,
           '[' || string_agg('"' || n_name || '"', ',' ORDER BY n_name) || ']' AS names_json
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "json"),
)
def agg_json_arrayagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_ARRAYAGG(name ORDER BY name) per region."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("n_name")),
                    lambda x: F.concat(F.lit('"'), x, F.lit('"')),
                ),
                ",",
            ),
            F.lit("]"),
        ).alias("names_json")
    )


@query(
    "agg_single_value",
    oracle="""
    SELECT n_nationkey,
           CASE WHEN count(*) = 1 THEN max(s_name) END AS the_supplier,
           count(*) = 1 AS is_single
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    tags=("agg",),
)
def agg_single_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SINGLE_VALUE: the group's value iff exactly one row, else NULL +
    flag (Flink raises at runtime — SQL surfaces the violation as a
    column instead)."""
    s, n = load(spark, sf_dir, "supplier"), load(spark, sf_dir, "nation")
    j = s.join(n, s.s_nationkey == n.n_nationkey)
    return j.groupBy("n_nationkey").agg(
        F.when(F.count("*") == 1, F.max("s_name")).alias("the_supplier"),
        (F.count("*") == 1).alias("is_single"),
    )


@query(
    "agg_multiset_collect",
    oracle="""
    WITH counted AS (
      SELECT o_custkey, o_orderstatus, count(*) AS n
      FROM orders GROUP BY o_custkey, o_orderstatus
    )
    SELECT o_custkey,
           '{' || string_agg('"' || o_orderstatus || '":' || n, ',' ORDER BY o_orderstatus) || '}'
             AS status_multiset
    FROM counted GROUP BY o_custkey
    """,
    tags=("agg", "collections"),
)
def agg_multiset_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT → MULTISET<orderstatus> represented as value→count map
    (exactly Flink's multiset encoding, SURVEY.md §1.3), serialized
    key-sorted for the oracle hash."""
    o = load(spark, sf_dir, "orders")
    counted = o.groupBy("o_custkey", "o_orderstatus").agg(F.count("*").alias("n"))
    return (
        counted.groupBy("o_custkey")
        .agg(F.array_sort(F.collect_list(F.struct("o_orderstatus", "n"))).alias("__e"))
        .select(
            "o_custkey",
            F.concat(
                F.lit("{"),
                F.array_join(
                    F.transform(
                        F.col("__e"),
                        lambda x: F.concat(
                            F.lit('"'), x["o_orderstatus"], F.lit('":'), x["n"].cast("string")
                        ),
                    ),
                    ",",
                ),
                F.lit("}"),
            ).alias("status_multiset"),
        )
    )


@query(
    "over_range_interval_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW
           ), 4) AS sum_10m
    FROM events
    """,
    tags=("over", "window"),
)
def over_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING — time-range frame
    (reference RangeBoundedPrecedingOverFrame): orderBy unix micros
    (full timestamp precision — second-truncation flips rows at the
    exact 600s boundary), rangeBetween(-600e6, 0)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id", "ts", F.round(F.sum("value").over(w), 4).alias("sum_10m")
    )


@query(
    "join_tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "tpch"),
)
def join_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + agg + top-10 (TakeOrderedAndProject)."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "join_tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "tpch"),
)
def join_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, quarter window."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-04-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "agg_grouping_funcs",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "grouping-sets"),
)
def agg_grouping_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING / GROUPING_ID over CUBE (FlinkSqlOperatorTable GROUPING
    :GROUPING_ID; DecomposeGroupingSetsRule rewrites them onto the
    Expand marker column — Catalyst's spark_grouping_id is the same
    mechanism, and the bit order matches the standard)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n"),
        )
    )


@query(
    "agg_sum0_empty_input",
    oracle="""
    SELECT coalesce(CAST(sum(l_quantity) AS DOUBLE), 0.0) AS sum0_qty,
           count(*) AS n
    FROM lineitem WHERE l_quantity < 0
    """,
    tags=("agg",),
)
def agg_sum0_empty_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM0 (SumAggFunction.Sum0AggFunction — 0, not NULL, on empty
    input): coalesce(sum, 0) over a provably-empty selection; the
    global agg still emits exactly one row on both engines."""
    l = load(spark, sf_dir, "lineitem")
    return l.where("l_quantity < 0").agg(
        F.coalesce(F.sum("l_quantity"), F.lit(0.0)).alias("sum0_qty"),
        F.count("*").alias("n"),
    )


@query(
    "agg_json_on_null_modes",
    oracle="""
    WITH t AS (
      SELECT n_regionkey, n_nationkey, n_name,
             CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_name END AS v
      FROM nation
    )
    SELECT n_regionkey,
           '[' || string_agg(coalesce('"' || v || '"', 'null'), ','
                             ORDER BY n_nationkey) || ']' AS arr_null_on_null,
           '[' || coalesce(string_agg(CASE WHEN v IS NOT NULL
                                           THEN '"' || v || '"' END, ','
                                      ORDER BY n_nationkey), '') || ']'
             AS arr_absent_on_null,
           '{' || string_agg('"' || n_name || '":'
                             || coalesce('"' || v || '"', 'null'), ','
                             ORDER BY n_name) || '}' AS obj_null_on_null,
           '{' || coalesce(string_agg(CASE WHEN v IS NOT NULL THEN
                                      '"' || n_name || '":"' || v || '"' END,
                                      ',' ORDER BY n_name), '') || '}'
             AS obj_absent_on_null
    FROM t GROUP BY n_regionkey
    """,
    tags=("agg", "json"),
)
def agg_json_on_null_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_ARRAYAGG / JSON_OBJECTAGG with BOTH ``NULL ON NULL`` and
    ``ABSENT ON NULL`` modes (BuiltInFunctionDefinitions
    JSON_ARRAYAGG_NULL_ON_NULL/_ABSENT_ON_NULL and the objectagg
    twins; SqlJsonArrayAggAggFunction in Calcite). collect_list drops
    bare NULLs, so null-preserving aggregation collects structs —
    order pinned by n_nationkey (arrays) / key (objects) on both
    sides so the hash compares deterministic strings."""
    n = load(spark, sf_dir, "nation").withColumn(
        "v",
        F.when(F.col("n_nationkey") % 3 == 0, F.lit(None)).otherwise(F.col("n_name")),
    )
    pairs_by_id = F.array_sort(F.collect_list(F.struct("n_nationkey", "v")))
    pairs_by_key = F.array_sort(F.collect_list(F.struct("n_name", "v")))
    quoted = lambda c: F.concat(F.lit('"'), c, F.lit('"'))  # noqa: E731
    return n.groupBy("n_regionkey").agg(
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(pairs_by_id, lambda p: F.coalesce(quoted(p.v), F.lit("null"))),
                ",",
            ),
            F.lit("]"),
        ).alias("arr_null_on_null"),
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    F.filter(pairs_by_id, lambda p: p.v.isNotNull()),
                    lambda p: quoted(p.v),
                ),
                ",",
            ),
            F.lit("]"),
        ).alias("arr_absent_on_null"),
        F.concat(
            F.lit("{"),
            F.array_join(
                F.transform(
                    pairs_by_key,
                    lambda p: F.concat(
                        quoted(p.n_name), F.lit(":"),
                        F.coalesce(quoted(p.v), F.lit("null")),
                    ),
                ),
                ",",
            ),
            F.lit("}"),
        ).alias("obj_null_on_null"),
        F.concat(
            F.lit("{"),
            F.array_join(
                F.transform(
                    F.filter(pairs_by_key, lambda p: p.v.isNotNull()),
                    lambda p: F.concat(quoted(p.n_name), F.lit(":"), quoted(p.v)),
                ),
                ",",
            ),
            F.lit("}"),
        ).alias("obj_absent_on_null"),
    )
