"""Sort / limit / set-operation family (SURVEY.md §2.7).

Reference parity: BatchExecSort.java:46 (external merge sort →
Tungsten SortExec), BatchExecSortLimit.java:48 (→
TakeOrderedAndProjectExec), StreamExecUnion.java:45,
ReplaceIntersectWithSemiJoinRule / RewriteIntersectAllRule,
ReplaceMinusWithAntiJoinRule / RewriteMinusAllRule — Catalyst has the
identical rewrites built in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort",),
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject: per-partition top-k
    then driver merge of k·partitions rows — never a global sort at
    100 TB."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"), "o_orderdate")
    )


@query(
    "sort_multi_key_nulls",
    oracle="""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS bal
    FROM customer
    ORDER BY c_nationkey ASC NULLS FIRST, c_acctbal DESC, c_custkey
    LIMIT 50
    """,
    tags=("sort",),
)
def sort_multi_key_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering (Flink/Calcite default
    NULLS FIRST for ASC — Spark matches via asc_nulls_first)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.orderBy(
            F.col("c_nationkey").asc_nulls_first(), F.col("c_acctbal").desc(), F.col("c_custkey")
        )
        .limit(50)
        .select("c_custkey", "c_nationkey", F.round("c_acctbal", 2).alias("bal"))
    )


def _orders_split(spark: SparkSession, sf_dir: str):
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 50000).select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return a, b


@query(
    "setop_union_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (StreamExecUnion.java:45 / BatchExecUnion)."""
    a, b = _orders_split(spark, sf_dir)
    return a.unionAll(b)


@query(
    "setop_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + agg-dedup rewrite (Calcite UNION_TO_DISTINCT)."""
    a, b = _orders_split(spark, sf_dir)
    return a.union(b).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT -> semi-join rewrite (ReplaceIntersectWithSemiJoinRule.scala)."""
    a, b = _orders_split(spark, sf_dir)
    return a.intersect(b)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — counted replication (reference
    RewriteIntersectAllRule.scala; Catalyst: same rewrite)."""
    a, b = _orders_split(spark, sf_dir)
    return a.intersectAll(b)


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT -> anti-join rewrite (ReplaceMinusWithAntiJoinRule.scala)."""
    a, b = _orders_split(spark, sf_dir)
    return a.subtract(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL -> counted replication rewrite (RewriteMinusAllRule.scala)."""
    a, b = _orders_split(spark, sf_dir)
    return a.exceptAll(b)


@query(
    "values_inline",
    oracle="""
    SELECT id, name, CAST(score AS DOUBLE) AS score
    FROM (VALUES (1, 'EUROPE', 10.5), (2, 'ASIA', 20.25), (3, 'AFRICA', NULL))
      AS t(id, name, score)
    """,
    tags=("values",),
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES source (reference StreamExecValues.java /
    BatchExecValues.java:37) → spark.sql VALUES / createDataFrame."""
    return spark.sql(
        """
        SELECT * FROM VALUES (1, 'EUROPE', CAST(10.5 AS DOUBLE)),
                             (2, 'ASIA', 20.25),
                             (3, 'AFRICA', CAST(NULL AS DOUBLE)) AS t(id, name, score)
        """
    )
