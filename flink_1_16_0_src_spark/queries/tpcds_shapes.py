"""TPC-DS characteristic query shapes, adapted to the fixture schema.

The reference's end-to-end gate is TPC-DS 99/99 at SF1
(flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:76-84).
The driver's star schema is TPC-H-ish, so running literal TPC-DS is
impossible — instead this module reproduces the *operator combinations*
that make TPC-DS harder than TPC-H, each tagged with the query family
it represents:

- q67: ROLLUP + window rank over the aggregate output
- q51: full-outer join of two cumulative window aggregates
- q88: many scalar subqueries glued into one row (multi-scan fusion)
- q74/q11: year-over-year self-join of a CTE with ratio filter
- q36: grouping()-driven ranking partitions (lochierarchy)
- q49: UNION of ranked channel subqueries with two orderings

Everything is declarative SQL on both engines; the point is planner
stress (Expand + Window + outer joins + repeated scans), not new
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import register_views

_BATCH = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir, _BATCH)
    return spark.sql(sql)


def _register(name: str, sql: str, doc: str):
    def _q(spark: SparkSession, sf_dir: str, _sql_text=sql) -> DataFrame:
        return _sql(spark, sf_dir, _sql_text)

    # doc/name must be set BEFORE the decorator captures them
    _q.__doc__ = doc
    _q.__name__ = name
    return query(name, oracle=sql, tags=("tpcds-shape",))(_q)


_register(
    "tpcds_q67_rollup_rank",
    """
WITH agg AS (
  SELECT p_type, p_brand, round(sum(l_extendedprice), 2) AS sumsales
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY ROLLUP (p_type, p_brand)
)
SELECT * FROM (
  SELECT p_type, p_brand, sumsales,
         rank() OVER (PARTITION BY p_type ORDER BY sumsales DESC, p_brand) AS rk
  FROM agg
) t
WHERE rk <= 3
""",
    "TPC-DS q67 shape: window rank layered over a ROLLUP aggregate "
    "(Expand feeding Window).",
)

_register(
    "tpcds_q51_cumulative_full_join",
    """
WITH web AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         sum(sum(o_totalprice)) OVER (PARTITION BY o_custkey
           ORDER BY CAST(o_orderdate AS DATE)
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
  FROM orders WHERE o_orderstatus = 'O'
  GROUP BY o_custkey, CAST(o_orderdate AS DATE)
),
store AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         sum(sum(o_totalprice)) OVER (PARTITION BY o_custkey
           ORDER BY CAST(o_orderdate AS DATE)
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
  FROM orders WHERE o_orderstatus = 'F'
  GROUP BY o_custkey, CAST(o_orderdate AS DATE)
)
SELECT coalesce(w.o_custkey, s.o_custkey) AS custkey,
       CAST(coalesce(w.d, s.d) AS STRING) AS d,
       round(w.cume, 2) AS web_cume,
       round(s.cume, 2) AS store_cume
FROM web w FULL OUTER JOIN store s
  ON w.o_custkey = s.o_custkey AND w.d = s.d
WHERE coalesce(w.cume, 0) > 2 * coalesce(s.cume, 0)
""",
    "TPC-DS q51 shape: two cumulative (running-sum over agg) channels "
    "full-outer joined and compared.",
)

_register(
    "tpcds_q88_multi_scalar_row",
    """
SELECT
  (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS b1,
  (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS b2,
  (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS b3,
  (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS b4,
  (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS b5
""",
    "TPC-DS q88 shape: five scalar-subquery scans fused into a single "
    "output row.",
)

_register(
    "tpcds_q74_year_over_year",
    """
WITH yearly AS (
  SELECT o_custkey, year(o_orderdate) AS yr,
         sum(o_totalprice) AS total
  FROM orders GROUP BY o_custkey, year(o_orderdate)
)
SELECT y1.o_custkey,
       round(y1.total, 2) AS total_1996,
       round(y2.total, 2) AS total_1997
FROM yearly y1 JOIN yearly y2 ON y1.o_custkey = y2.o_custkey
WHERE y1.yr = 1996 AND y2.yr = 1997
  AND y2.total > 1.1 * y1.total
""",
    "TPC-DS q74/q11 shape: self-join of a per-year CTE with a "
    "year-over-year growth predicate.",
)

_register(
    "tpcds_q36_lochierarchy_rank",
    """
SELECT p_type, p_brand,
       CAST(GROUPING(p_type) + GROUPING(p_brand) AS BIGINT) AS lochierarchy,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       rank() OVER (
         PARTITION BY GROUPING(p_type) + GROUPING(p_brand),
                      CASE WHEN GROUPING(p_brand) = 1 THEN NULL ELSE p_type END
         ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC
       ) AS rank_within_parent
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ROLLUP (p_type, p_brand)
""",
    "TPC-DS q36 shape: GROUPING()-derived hierarchy level used both as "
    "a projected column and a window partition key over ROLLUP output.",
)

_register(
    "tpcds_q38_intersect_count",
    """
SELECT count(*) AS cnt FROM (
  SELECT DISTINCT o_custkey, year(o_orderdate) AS yr
  FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT DISTINCT o_custkey, year(o_orderdate) AS yr
  FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT DISTINCT o_custkey, year(o_orderdate) AS yr
  FROM orders WHERE o_orderstatus = 'P'
) t
""",
    "TPC-DS q38 shape: COUNT over a three-way multi-column INTERSECT "
    "of per-channel distinct customer/date tuples (anti-join chain "
    "after Catalyst's ReplaceIntersectWithSemiJoin).",
)

_register(
    "tpcds_q87_except_count",
    """
SELECT count(*) AS cnt FROM (
  SELECT DISTINCT o_custkey, year(o_orderdate) AS yr
  FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT DISTINCT o_custkey, year(o_orderdate) AS yr
  FROM orders WHERE o_orderstatus = 'F'
  EXCEPT
  SELECT DISTINCT o_custkey, year(o_orderdate) AS yr
  FROM orders WHERE o_orderstatus = 'P'
) t
""",
    "TPC-DS q87 shape: chained multi-column EXCEPT feeding a COUNT "
    "(ReplaceExceptWithAntiJoin path).",
)

_register(
    "tpcds_q95_exists_chain",
    """
SELECT count(DISTINCT o.o_orderkey) AS order_cnt,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o
WHERE o.o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
    WHERE l1.l_orderkey = o.o_orderkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = o.o_orderkey AND l3.l_returnflag = 'R'
  )
""",
    "TPC-DS q95 shape: correlated EXISTS over a self-joined fact "
    "(multi-supplier orders) plus a NOT EXISTS filter — semi- and "
    "anti-join against the same fact table in one query.",
)

_register(
    "tpcds_q5_channel_rollup",
    """
WITH sales AS (
  SELECT 'open' AS channel, o_orderpriority AS id,
         o_totalprice AS sales, 0.0 AS returns_
  FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT 'closed' AS channel, o_orderpriority AS id,
         o_totalprice AS sales, o_totalprice * 0.1 AS returns_
  FROM orders WHERE o_orderstatus = 'F'
)
SELECT channel, id,
       round(sum(sales), 2)    AS sales,
       round(sum(returns_), 2) AS returns_,
       CAST(count(*) AS BIGINT) AS n
FROM sales
GROUP BY ROLLUP (channel, id)
""",
    "TPC-DS q5 shape: per-channel sales/returns fact union rolled up "
    "with ROLLUP over (channel, id) — union feeding Expand.",
)

_register(
    "tpcds_q33_union_agg",
    """
WITH a AS (
  SELECT p_brand, round(sum(l_extendedprice), 2) AS amt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'A' GROUP BY p_brand
),
b AS (
  SELECT p_brand, round(sum(l_extendedprice), 2) AS amt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'N' GROUP BY p_brand
),
c AS (
  SELECT p_brand, round(sum(l_extendedprice), 2) AS amt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'R' GROUP BY p_brand
)
SELECT p_brand, round(sum(amt), 2) AS total
FROM (SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c) u
GROUP BY p_brand
""",
    "TPC-DS q33 shape: three per-segment aggregates of the same "
    "fact-dim join unioned then re-aggregated (repeated-scan fusion "
    "stress).",
)

_register(
    "tpcds_q49_union_ranked_channels",
    """
WITH ranked AS (
  SELECT 'open' AS channel, o_custkey,
         round(sum(o_totalprice), 2) AS amt,
         rank() OVER (ORDER BY sum(o_totalprice) DESC, o_custkey) AS rnk
  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
  UNION ALL
  SELECT 'closed' AS channel, o_custkey,
         round(sum(o_totalprice), 2) AS amt,
         rank() OVER (ORDER BY sum(o_totalprice) DESC, o_custkey) AS rnk
  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
)
SELECT channel, o_custkey, amt, rnk
FROM ranked WHERE rnk <= 10
""",
    "TPC-DS q49 shape: per-channel ranked aggregates unioned then "
    "rank-filtered.",
)
