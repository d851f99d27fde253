"""Subquery family (SURVEY.md §4.1 subquery_rewrite / decorrelate).

Reference parity: FlinkSubQueryRemoveRule.scala (IN/EXISTS → semi/anti
join), SubQueryDecorrelator.java (correlated → join) — Catalyst's
RewritePredicateSubquery / DecorrelateInnerQuery are the same rewrites;
these queries pin the semantics. Shapes follow the reference's own
TPC-H subset (q11/q15/q20,
flink-end-to-end-tests/test-scripts/test-data/tpch/modified-query/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import register_views

_BATCH = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir, _BATCH)
    return spark.sql(sql)


_SCALAR = """
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders
WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
"""


@query("subq_scalar_uncorrelated", oracle=_SCALAR, tags=("subquery",))
def subq_scalar_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in WHERE (orders above 2x the average price)."""
    return _sql(spark, sf_dir, _SCALAR)


_SCALAR_CORR = """
SELECT c_custkey, c_name,
       (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
       round((SELECT coalesce(sum(o_totalprice), 0) FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'), 2) AS open_total
FROM customer c
"""


@query("subq_scalar_correlated", oracle=_SCALAR_CORR, tags=("subquery",))
def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in SELECT — decorrelated to a left
    outer aggregate join on both engines."""
    return _sql(spark, sf_dir, _SCALAR_CORR)


_IN_AGG = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 50
)
"""


@query("subq_in_aggregated", oracle=_IN_AGG, tags=("subquery", "tpch"))
def subq_in_aggregated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: IN over an aggregated subquery."""
    return _sql(spark, sf_dir, _IN_AGG)


_EXISTS_CORR = """
SELECT o_orderkey, o_orderpriority
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
"""


@query(
    "subq_exists_correlated",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    """,
    tags=("subquery", "tpch"),
)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: correlated EXISTS with an inequality on the
    correlated column."""
    return _sql(spark, sf_dir, _EXISTS_CORR)


_NOT_IN = """
SELECT c_custkey, c_name
FROM customer
WHERE c_nationkey NOT IN (
  SELECT n_nationkey FROM nation WHERE n_regionkey = 0
)
"""


@query("subq_not_in", oracle=_NOT_IN, tags=("subquery",))
def subq_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN → null-aware anti join (Spark NullAwareAntiJoin; the
    reference routes it through the same three-valued-logic rewrite)."""
    return _sql(spark, sf_dir, _NOT_IN)


_Q11 = """
SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS value
FROM lineitem
GROUP BY l_suppkey
HAVING sum(l_extendedprice * (1 - l_discount)) > (
  SELECT sum(l_extendedprice * (1 - l_discount)) * 0.05 FROM lineitem
)
"""


@query("subq_tpch_q11_having", oracle=_Q11, tags=("subquery", "tpch"))
def subq_tpch_q11_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape (one of the reference's four gated TPC-H
    queries): HAVING against a scalar subquery over the same table."""
    return _sql(spark, sf_dir, _Q11)


_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 2) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@query("subq_tpch_q15_view_max", oracle=_Q15, tags=("subquery", "tpch"))
def subq_tpch_q15_view_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape (reference-gated): CTE revenue view + scalar max
    subquery over it."""
    return _sql(spark, sf_dir, _Q15)


_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 100
)
AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
"""


@query("subq_tpch_q20_nested_in", oracle=_Q20, tags=("subquery", "tpch"))
def subq_tpch_q20_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape (reference-gated): stacked IN subqueries."""
    return _sql(spark, sf_dir, _Q20)


_LATERAL = """
SELECT n.n_name, t.top_bal
FROM nation n,
LATERAL (
  SELECT max(s_acctbal) AS top_bal
  FROM supplier s WHERE s.s_nationkey = n.n_nationkey
) t
WHERE t.top_bal IS NOT NULL
"""


@query("subq_lateral", oracle=_LATERAL, tags=("subquery", "correlate"))
def subq_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table (reference Correlate node,
    EXEC-S/StreamExecCorrelate.java:53)."""
    return _sql(spark, sf_dir, _LATERAL)
