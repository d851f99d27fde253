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

_BATCH = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events")


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

# q88 r12: the DuckDB oracle keeps the literal five-scalar-subquery
# text (the q88 SHAPE being exercised); the Spark side fuses the five
# band counts into ONE conditional-aggregate scan — count(CASE) counts
# exactly the rows each subquery's WHERE kept, so the row is
# bit-identical while the fact table is read once instead of five
# times (the multi-scan fusion a good planner would do itself; Spark's
# does not share scalar-subquery scans). Registered via _register_pair
# (defined below; registration deferred to module end).
_Q88_SPARK = """
SELECT
  count(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 END) AS b1,
  count(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN 1 END) AS b2,
  count(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN 1 END) AS b3,
  count(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN 1 END) AS b4,
  count(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN 1 END) AS b5
FROM lineitem
"""
_Q88_ORACLE = """
SELECT
  (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS b1,
  (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS b2,
  (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS b3,
  (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS b4,
  (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS b5
"""

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


_register(
    "tpcds_q1_returns_above_avg",
    """
WITH cust_total AS (
  SELECT o_custkey, c_nationkey, round(sum(o_totalprice), 2) AS total
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY o_custkey, c_nationkey
)
SELECT ct.o_custkey, ct.total
FROM cust_total ct
WHERE ct.total > (SELECT avg(ct2.total) * 1.2 FROM cust_total ct2
                  WHERE ct2.c_nationkey = ct.c_nationkey)
ORDER BY ct.o_custkey
""",
    "TPC-DS q1 shape: correlated scalar subquery comparing each "
    "customer's total against 1.2x their nation's average (CTE reused "
    "on both sides of the correlation).",
)

_register(
    "tpcds_q57_monthly_deviation",
    """
WITH monthly AS (
  SELECT p_brand, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         round(sum(l_extendedprice), 2) AS sales
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, year(o_orderdate), month(o_orderdate)
), with_avg AS (
  SELECT p_brand, yr, mo, sales,
         round(avg(sales) OVER (PARTITION BY p_brand, yr) + 0.00001, 2) AS avg_sales
  FROM monthly
), dev AS (
  SELECT p_brand, yr, mo, sales, avg_sales,
         rank() OVER (PARTITION BY p_brand, yr
                      ORDER BY round(sales - avg_sales, 2) DESC, mo) AS rnk
  FROM with_avg
)
SELECT p_brand, yr, mo, sales, avg_sales, rnk
FROM dev WHERE rnk <= 2
ORDER BY p_brand, yr, rnk, mo
""",
    "TPC-DS q57/q47 shape: per-entity monthly series, window average "
    "within the year, rank months by (rounded) deviation from that "
    "average, keep the top deviators.",
)

_register(
    "tpcds_q62_delay_buckets",
    """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN mdelay <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS within_1mo,
       CAST(sum(CASE WHEN mdelay = 2 THEN 1 ELSE 0 END) AS BIGINT) AS mo_2,
       CAST(sum(CASE WHEN mdelay = 3 THEN 1 ELSE 0 END) AS BIGINT) AS mo_3,
       CAST(sum(CASE WHEN mdelay > 3 THEN 1 ELSE 0 END) AS BIGINT) AS over_3mo
FROM (
  SELECT o_orderpriority,
         (year(l_shipdate) * 12 + month(l_shipdate))
         - (year(o_orderdate) * 12 + month(o_orderdate)) AS mdelay
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
) d
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    "TPC-DS q62/q99 shape: shipping-latency histogram — pivoted CASE "
    "bucket counts per priority (dialect-neutral month arithmetic "
    "instead of datediff).",
)

_register(
    "tpcds_q73_order_count_band",
    """
WITH cnt AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_orders
FROM cnt JOIN customer ON o_custkey = c_custkey
WHERE n_orders BETWEEN 3 AND 8
ORDER BY n_orders DESC, c_custkey
LIMIT 50
""",
    "TPC-DS q73/q34 shape: frequency-band membership — per-customer "
    "order counts filtered to a band, deterministically ranked limit.",
)

_register(
    "tpcds_q78_unreturned_ratio",
    """
WITH returned AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT year(o_orderdate) AS yr, l.l_suppkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)) + 0.00001, 2) AS net_sales,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
LEFT JOIN returned r
  ON l.l_orderkey = r.l_orderkey AND l.l_partkey = r.l_partkey
WHERE r.l_orderkey IS NULL
GROUP BY year(o_orderdate), l.l_suppkey
ORDER BY yr, l.l_suppkey
""",
    "TPC-DS q78 shape: exclude returned sales via anti-join (LEFT JOIN "
    "... IS NULL over a DISTINCT returns derivation), then aggregate "
    "the surviving lines per supplier-year.",
)

_register(
    "tpcds_q54_revenue_segments",
    """
WITH rev AS (
  SELECT o_custkey, CAST(floor(sum(o_totalprice) / 50000) AS BIGINT) AS segment
  FROM orders GROUP BY o_custkey
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_customers
FROM rev GROUP BY segment ORDER BY segment
""",
    "TPC-DS q54 shape: customer segmentation — bucket lifetime revenue "
    "into fixed-width segments and count the histogram.",
)


_register(
    "tpcds_q17_quantity_stats",
    """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(avg(l_quantity), 4) AS mean_qty,
       round(stddev_samp(l_quantity), 4) AS std_qty,
       round(CASE WHEN avg(l_quantity) = 0 THEN NULL
                  ELSE stddev_samp(l_quantity) / avg(l_quantity) END, 4) AS cov_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
HAVING count(*) >= 5 AND stddev_samp(l_quantity) / avg(l_quantity) > 0.4
ORDER BY p_brand
""",
    "TPC-DS q17 shape: per-group mean/stddev with a coefficient-of-"
    "variation HAVING filter (statistical agg + post-agg predicate).",
)

_register(
    "tpcds_q23_frequent_buyers",
    """
WITH frequent AS (
  SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 4
), spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
  FROM orders GROUP BY o_custkey
), best AS (
  SELECT o_custkey, total_spend,
         rank() OVER (ORDER BY total_spend DESC, o_custkey) AS rnk
  FROM spend WHERE o_custkey IN (SELECT o_custkey FROM frequent)
)
SELECT o_custkey, total_spend, rnk FROM best WHERE rnk <= 20
""",
    "TPC-DS q23 shape: frequency-qualified membership (HAVING-derived "
    "set) intersected with a spend ranking — semi join into window "
    "rank.",
)

_register(
    "tpcds_q65_min_revenue_brand",
    """
WITH rev AS (
  SELECT l_suppkey, p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY l_suppkey, p_brand
), min_rev AS (
  SELECT l_suppkey, min(revenue) AS min_revenue FROM rev GROUP BY l_suppkey
)
SELECT s_name, r.p_brand, r.revenue
FROM rev r
JOIN min_rev m ON r.l_suppkey = m.l_suppkey AND r.revenue = m.min_revenue
JOIN supplier ON r.l_suppkey = s_suppkey
ORDER BY s_name, r.p_brand
""",
    "TPC-DS q65 shape: per-entity minimum selection via self-join of "
    "an aggregate with its per-key min (argmin without window "
    "functions, the q65 idiom).",
)

_register(
    "tpcds_q89_rolling_deviation",
    """
WITH monthly AS (
  SELECT p_type, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         round(sum(l_extendedprice), 2) AS sales
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(o_orderdate) = 1995
  GROUP BY p_type, year(o_orderdate), month(o_orderdate)
), roll AS (
  SELECT p_type, yr, mo, sales,
         round(avg(sales) OVER (PARTITION BY p_type ORDER BY mo
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS roll_avg
  FROM monthly
)
SELECT p_type, yr, mo, sales, roll_avg,
       round(sales - roll_avg, 2) AS dev
FROM roll
WHERE abs(sales - roll_avg) > 0.1 * roll_avg
ORDER BY p_type, mo
""",
    "TPC-DS q89 shape: rolling window average over a monthly series "
    "with a relative-deviation filter (moving frame + post-window "
    "predicate).",
)


_register(
    "tpcds_q31_share_growth",
    """
WITH q AS (
  SELECT c_nationkey, year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
         round(sum(o_totalprice), 2) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) = 1995
  GROUP BY c_nationkey, year(o_orderdate), quarter(o_orderdate)
)
SELECT q1.c_nationkey,
       round(q2.rev / q1.rev, 4) AS g12,
       round(q3.rev / q2.rev, 4) AS g23
FROM q q1 JOIN q q2 ON q1.c_nationkey = q2.c_nationkey AND q1.qtr = 1 AND q2.qtr = 2
          JOIN q q3 ON q2.c_nationkey = q3.c_nationkey AND q3.qtr = 3
WHERE q1.rev > 0 AND q2.rev > 0
  AND q2.rev / q1.rev > q3.rev / q2.rev
ORDER BY q1.c_nationkey
""",
    "TPC-DS q31 shape: period-over-period growth ratios via triple "
    "self-join of one aggregate CTE, with a ratio-comparison filter.",
)

_register(
    "tpcds_q39_consecutive_cov",
    """
WITH stats AS (
  SELECT l_suppkey, month(l_shipdate) AS mo,
         round(avg(l_quantity), 4) AS mean_q,
         round(stddev_samp(l_quantity), 4) AS std_q
  FROM lineitem WHERE year(l_shipdate) = 1995 AND month(l_shipdate) IN (3, 4)
  GROUP BY l_suppkey, month(l_shipdate)
  HAVING count(*) >= 3 AND avg(l_quantity) > 0 AND stddev_samp(l_quantity) / avg(l_quantity) > 0.5
)
SELECT a.l_suppkey,
       a.mean_q AS mean_m3, a.std_q AS std_m3,
       b.mean_q AS mean_m4, b.std_q AS std_m4
FROM stats a JOIN stats b ON a.l_suppkey = b.l_suppkey AND a.mo = 3 AND b.mo = 4
ORDER BY a.l_suppkey
""",
    "TPC-DS q39 shape: coefficient-of-variation outliers that persist "
    "across two consecutive periods (HAVING-filtered stats CTE "
    "self-joined month-to-month).",
)

_register(
    "tpcds_q44_best_worst",
    """
WITH perf AS (
  SELECT l_partkey, round(avg(l_extendedprice * (1 - l_discount)), 2) AS net
  FROM lineitem GROUP BY l_partkey HAVING count(*) >= 2
), ranked AS (
  SELECT l_partkey, net,
         rank() OVER (ORDER BY net DESC, l_partkey) AS best_rnk,
         rank() OVER (ORDER BY net ASC, l_partkey) AS worst_rnk
  FROM perf
)
SELECT 'best' AS side, best_rnk AS rnk, l_partkey, net
FROM ranked WHERE best_rnk <= 10
UNION ALL
SELECT 'worst' AS side, worst_rnk AS rnk, l_partkey, net
FROM ranked WHERE worst_rnk <= 10
""",
    "TPC-DS q44 shape: best and worst performers from ONE aggregate via "
    "two opposite-order ranks unioned (double ranking without a "
    "second scan).",
)

_register(
    "tpcds_q93_net_after_returns",
    """
SELECT l_suppkey,
       round(sum(CASE WHEN l_returnflag = 'R'
                      THEN l_extendedprice * (1 - l_discount) * 0.2
                      ELSE l_extendedprice * (1 - l_discount) END) + 0.00001, 2) AS net_sales
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus <> 'P'
GROUP BY l_suppkey
HAVING sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0
ORDER BY net_sales DESC, l_suppkey
LIMIT 25
""",
    "TPC-DS q93 shape: per-line return adjustment inside the aggregate "
    "(refund-rate CASE), return-presence HAVING, deterministic "
    "ranked limit.",
)


_register(
    "tpcds_q64_repeat_purchases",
    """
WITH cp AS (
  SELECT DISTINCT o_custkey, l_partkey, year(o_orderdate) AS yr
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT a.o_custkey, a.l_partkey, a.yr AS yr1, b.yr AS yr2
FROM cp a JOIN cp b
  ON a.o_custkey = b.o_custkey AND a.l_partkey = b.l_partkey AND b.yr = a.yr + 1
ORDER BY a.o_custkey, a.l_partkey, a.yr
""",
    "TPC-DS q64 shape: repeat purchases across consecutive years — "
    "DISTINCT fact derivation self-joined on (customer, part, "
    "year+1).",
)

_register(
    "tpcds_q41_attribute_exists",
    """
SELECT DISTINCT p1.p_brand
FROM part p1
WHERE p1.p_size BETWEEN 10 AND 20
  AND EXISTS (
    SELECT 1 FROM part p2
    WHERE p2.p_brand = p1.p_brand
      AND ((p2.p_type LIKE '%anodized%' AND p2.p_size BETWEEN 1 AND 15)
        OR (p2.p_type LIKE '%polished%' AND p2.p_size BETWEEN 5 AND 25))
  )
ORDER BY p1.p_brand
""",
    "TPC-DS q41 shape: correlated EXISTS whose inner predicate is a "
    "disjunction of attribute combinations (semi join with OR-chain "
    "build side).",
)

_register(
    "tpcds_q90_am_pm_ratio",
    """
SELECT round(CAST(am.cnt AS DOUBLE) / pm.cnt, 4) AS am_pm_ratio
FROM (SELECT count(*) AS cnt FROM events WHERE hour(ts) BETWEEN 6 AND 11) am,
     (SELECT count(*) AS cnt FROM events WHERE hour(ts) BETWEEN 18 AND 23) pm
WHERE pm.cnt > 0
""",
    "TPC-DS q90 shape: ratio of two independent scalar aggregates "
    "(cross join of single-row subqueries).",
)


_register(
    "tpcds_q4_channel_ratio_growth",
    """
WITH spend AS (
  SELECT c_custkey, c_name, year(o_orderdate) AS yr,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'prio' ELSE 'std' END AS chan,
         sum(o_totalprice) AS total
  FROM customer JOIN orders ON c_custkey = o_custkey
  WHERE year(o_orderdate) IN (1994, 1995)
  GROUP BY 1, 2, 3, 4
),
p AS (SELECT c_custkey, c_name,
             max(CASE WHEN yr = 1994 THEN total END) AS y1,
             max(CASE WHEN yr = 1995 THEN total END) AS y2
      FROM spend WHERE chan = 'prio' GROUP BY 1, 2),
s AS (SELECT c_custkey,
             max(CASE WHEN yr = 1994 THEN total END) AS y1,
             max(CASE WHEN yr = 1995 THEN total END) AS y2
      FROM spend WHERE chan = 'std' GROUP BY 1)
SELECT p.c_custkey, p.c_name,
       round(p.y2 / p.y1, 4) AS prio_growth,
       round(s.y2 / s.y1, 4) AS std_growth
FROM p JOIN s ON p.c_custkey = s.c_custkey
WHERE p.y1 > 0 AND p.y2 > 0 AND s.y1 > 0 AND s.y2 > 0
  AND p.y2 / p.y1 > s.y2 / s.y1
""",
    "q4/q11 family: multi-CTE per-channel year-over-year spend with a "
    "cross-channel growth-ratio comparison (the channelized "
    "CTE-pivot-join-compare shape; customers whose priority-channel "
    "growth beats their standard-channel growth).",
)


_register(
    "tpcds_q48_disjunctive_quantity",
    """
SELECT CAST(sum(l_quantity) AS BIGINT) AS qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE (c_mktsegment = 'BUILDING'  AND o_totalprice BETWEEN 50000 AND 150000 AND l_discount BETWEEN 0.01 AND 0.03)
   OR (c_mktsegment = 'MACHINERY' AND o_totalprice BETWEEN 100000 AND 250000 AND l_discount BETWEEN 0.04 AND 0.06)
   OR (c_mktsegment = 'HOUSEHOLD' AND o_totalprice BETWEEN 150000 AND 400000 AND l_discount BETWEEN 0.07 AND 0.09)
""",
    "q48: single wide scan with three disjunctive multi-column predicate "
    "branches over the joined row (planner must not split the OR into "
    "three scans; one pass, filter after join).",
)


_register(
    "tpcds_q61_promo_ratio",
    """
WITH promo AS (
  SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS promo_rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_discount >= 0.05
  GROUP BY n_name
),
total AS (
  SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT t.n_name, p.promo_rev, t.total_rev,
       round(p.promo_rev * 100.0 / t.total_rev, 4) AS promo_pct
FROM total t JOIN promo p ON t.n_name = p.n_name
""",
    "q61: promotional-vs-total revenue ratio — two near-identical "
    "aggregate subplans over the same join tree glued by a ratio "
    "(common-subplan planner stress; the reference runs it as two "
    "scalar subqueries multiplied by 100).",
)


_register(
    "tpcds_q66_time_band_pivot",
    """
SELECT s_name, n_name,
       round(sum(CASE WHEN month(l_shipdate) BETWEEN 1 AND 3  THEN l_extendedprice ELSE 0 END), 2) AS q1_rev,
       round(sum(CASE WHEN month(l_shipdate) BETWEEN 4 AND 6  THEN l_extendedprice ELSE 0 END), 2) AS q2_rev,
       round(sum(CASE WHEN month(l_shipdate) BETWEEN 7 AND 9  THEN l_extendedprice ELSE 0 END), 2) AS q3_rev,
       round(sum(CASE WHEN month(l_shipdate) BETWEEN 10 AND 12 THEN l_extendedprice ELSE 0 END), 2) AS q4_rev,
       CAST(sum(CASE WHEN month(l_shipdate) BETWEEN 1 AND 3  THEN l_quantity ELSE 0 END) AS BIGINT) AS q1_qty,
       CAST(sum(CASE WHEN month(l_shipdate) BETWEEN 10 AND 12 THEN l_quantity ELSE 0 END) AS BIGINT) AS q4_qty
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE year(l_shipdate) = 1995
GROUP BY s_name, n_name
""",
    "q66: warehouse-style time-band CASE pivot — one scan fans into "
    "per-quarter columns for two measures (map-side conditional "
    "aggregation; no Expand, no re-scan).",
)


_register(
    "tpcds_q72_date_offset_join",
    """
SELECT n_name, CAST(count(*) AS BIGINT) AS late_starts
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
  AND l_shipdate > o_orderdate + INTERVAL '60' DAY
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    "q72: equi-join with a date-offset inequality in the ON clause "
    "(d1 vs d2 + offset — the shape that punishes planners that turn "
    "it into a cross product; must stay a hash join with a residual "
    "condition).",
)


_register(
    "tpcds_q75_yoy_delta_union",
    """
WITH chan AS (
  SELECT p_brand, year(l_shipdate) AS yr,
         sum(l_quantity) AS qty, sum(l_extendedprice) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'N'
  GROUP BY 1, 2
  UNION ALL
  SELECT p_brand, year(l_shipdate) AS yr,
         sum(l_quantity) AS qty, sum(l_extendedprice) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag <> 'N'
  GROUP BY 1, 2
),
tot AS (
  SELECT p_brand, yr, CAST(sum(qty) AS BIGINT) AS qty, round(sum(rev), 2) AS rev
  FROM chan GROUP BY 1, 2
)
SELECT cur.p_brand, cur.yr,
       prev.qty AS prev_qty, cur.qty AS cur_qty,
       round(CAST(cur.qty AS DOUBLE) / prev.qty, 4) AS qty_ratio
FROM tot cur JOIN tot prev
  ON cur.p_brand = prev.p_brand AND cur.yr = prev.yr + 1
WHERE prev.qty > 0 AND CAST(cur.qty AS DOUBLE) / prev.qty < 0.9
""",
    "q75: union of per-channel aggregates re-aggregated, then a "
    "year-over-year self-join keeping brands whose quantity dropped "
    ">10% (union + re-agg + offset self-join + ratio filter).",
)


_register(
    "tpcds_q92_excess_discount",
    """
SELECT round(sum(l_extendedprice), 2) AS excess_revenue
FROM lineitem l1
WHERE year(l_shipdate) = 1995
  AND l_extendedprice > 1.3 * (
    SELECT avg(l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey
  )
""",
    "q92: correlated scalar-average subquery scaled by a constant as a "
    "row filter (decorrelates to an aggregate-join; the 1.3*avg "
    "threshold shape).",
)


_register(
    "tpcds_q10_multi_channel_exists",
    """
SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS rich
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
                AND o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
   OR EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
                AND o.o_totalprice > 250000)
GROUP BY n_name, c_mktsegment
""",
    "q10/q35: disjunction of two correlated EXISTS over different "
    "channel predicates, then demographic-style grouped counts — "
    "the existence-join union shape (planner must not multiply rows "
    "for customers matching both channels).",
)


_register(
    "tpcds_q14_cross_channel_intersect",
    """
WITH both_chan AS (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice), 2) AS rev
FROM lineitem
JOIN both_chan b ON lineitem.l_partkey = b.l_partkey
JOIN part ON lineitem.l_partkey = p_partkey
WHERE year(l_shipdate) = 1995
GROUP BY p_brand
""",
    "q14: cross-channel INTERSECT defines the qualifying item set, "
    "which then filters a fact scan (intersect → semi-join against "
    "the fact, the shared-CTE item-set shape).",
)


_register(
    "tpcds_q21_before_after_ratio",
    """
SELECT s_name,
       CAST(sum(CASE WHEN l_shipdate < DATE '1995-06-01' THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_before,
       CAST(sum(CASE WHEN l_shipdate >= DATE '1995-06-01' THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_after
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE l_shipdate BETWEEN DATE '1995-05-01' AND DATE '1995-07-01'
GROUP BY s_name
HAVING sum(CASE WHEN l_shipdate < DATE '1995-06-01' THEN l_quantity ELSE 0 END) > 0
   AND sum(CASE WHEN l_shipdate >= DATE '1995-06-01' THEN l_quantity ELSE 0 END)
       / sum(CASE WHEN l_shipdate < DATE '1995-06-01' THEN l_quantity ELSE 0 END)
       BETWEEN 0.5 AND 2.0
""",
    "q21: before/after pivot around an event date inside a bounded "
    "window, with a HAVING ratio band over the two conditional sums "
    "(the inventory before/after shape on the shipment fact).",
)


_register(
    "tpcds_q29_quantity_chain",
    """
SELECT p_brand, n_name,
       CAST(sum(l1.l_quantity) AS BIGINT) AS sold_qty,
       CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS n_orders
FROM lineitem l1
JOIN orders o1 ON l1.l_orderkey = o1.o_orderkey
JOIN customer c ON o1.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN part p ON l1.l_partkey = p.p_partkey
WHERE year(o1.o_orderdate) = 1994 AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2 JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
    WHERE l2.l_partkey = l1.l_partkey AND o2.o_custkey = o1.o_custkey
      AND year(o2.o_orderdate) = 1995
  )
GROUP BY p_brand, n_name
""",
    "q29/q25: returned items repurchased by the same customer the "
    "following year — a five-table join chain with a correlated "
    "two-table EXISTS on (part, customer), distinct-count per group.",
)


_register(
    "tpcds_q58_equal_share",
    """
WITH chan AS (
  SELECT p_brand,
         sum(CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE 0 END) AS c1,
         sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END) AS c2,
         sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice ELSE 0 END) AS c3
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = 1995
  GROUP BY p_brand
)
SELECT p_brand, round(c1, 2) AS c1, round(c2, 2) AS c2, round(c3, 2) AS c3
FROM chan
WHERE c1 > 0 AND c2 > 0 AND c3 > 0
  AND c1 BETWEEN 0.9 * (c1 + c2 + c3) / 3 AND 1.1 * (c1 + c2 + c3) / 3
  AND c2 BETWEEN 0.9 * (c1 + c2 + c3) / 3 AND 1.1 * (c1 + c2 + c3) / 3
  AND c3 BETWEEN 0.9 * (c1 + c2 + c3) / 3 AND 1.1 * (c1 + c2 + c3) / 3
""",
    "q58: brands whose revenue is within ±10% of the three-channel "
    "average in EVERY channel — symmetric band predicates over "
    "channel-pivot aggregates.",
)


# q9 r12: same fusion as q88 — the oracle keeps the literal
# nine-scalar-subquery text; the Spark side computes every band's
# count/avg(price)/avg(discount) in ONE conditional-aggregate pass.
# avg(CASE WHEN band THEN x END) aggregates exactly the rows the
# filtered subquery aggregated, in the same scan/partition order
# (partial sums add the same doubles in the same sequence), and both
# sides round to 4 dp — bit-identical while lineitem is read once
# instead of nine times. Registered at module end via _register_pair.
# Tolerance assumption (ADVICE r12 #1, documented): each band average is
# round(avg(...), 4) on BOTH engines; Spark's partition fold and DuckDB's
# sequential fold can differ in the last ulp, and 4-dp rounding absorbs
# that — the same float-surface rule every rounded aggregate in the repo
# relies on. The residual risk is an average landing within one ulp of a
# .00005 boundary; if such a flake ever appears, compute the averages as
# exact sum-and-count pairs (decimal sums, one double divide — the
# _centroid_means recipe) on both sides instead of widening tolerance.
_Q9_SPARK = """
WITH bands AS (
  SELECT
    count(CASE WHEN l_quantity BETWEEN 1 AND 20 THEN 1 END) AS n1,
    round(avg(CASE WHEN l_quantity BETWEEN 1 AND 20 THEN l_extendedprice END), 4) AS p1,
    round(avg(CASE WHEN l_quantity BETWEEN 1 AND 20 THEN l_discount END), 4) AS d1,
    count(CASE WHEN l_quantity BETWEEN 21 AND 35 THEN 1 END) AS n2,
    round(avg(CASE WHEN l_quantity BETWEEN 21 AND 35 THEN l_extendedprice END), 4) AS p2,
    round(avg(CASE WHEN l_quantity BETWEEN 21 AND 35 THEN l_discount END), 4) AS d2,
    count(CASE WHEN l_quantity BETWEEN 36 AND 50 THEN 1 END) AS n3,
    round(avg(CASE WHEN l_quantity BETWEEN 36 AND 50 THEN l_extendedprice END), 4) AS p3,
    round(avg(CASE WHEN l_quantity BETWEEN 36 AND 50 THEN l_discount END), 4) AS d3
  FROM lineitem
)
SELECT CASE WHEN n1 > 25000 THEN p1 ELSE d1 END AS bucket1,
       CASE WHEN n2 > 25000 THEN p2 ELSE d2 END AS bucket2,
       CASE WHEN n3 > 25000 THEN p3 ELSE d3 END AS bucket3
FROM bands
"""
_Q9_ORACLE = """
SELECT CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 20) > 25000
            THEN (SELECT round(avg(l_extendedprice), 4) FROM lineitem WHERE l_quantity BETWEEN 1 AND 20)
            ELSE (SELECT round(avg(l_discount), 4) FROM lineitem WHERE l_quantity BETWEEN 1 AND 20)
       END AS bucket1,
       CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 35) > 25000
            THEN (SELECT round(avg(l_extendedprice), 4) FROM lineitem WHERE l_quantity BETWEEN 21 AND 35)
            ELSE (SELECT round(avg(l_discount), 4) FROM lineitem WHERE l_quantity BETWEEN 21 AND 35)
       END AS bucket2,
       CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 36 AND 50) > 25000
            THEN (SELECT round(avg(l_extendedprice), 4) FROM lineitem WHERE l_quantity BETWEEN 36 AND 50)
            ELSE (SELECT round(avg(l_discount), 4) FROM lineitem WHERE l_quantity BETWEEN 36 AND 50)
       END AS bucket3
"""


_register(
    "tpcds_q13_demographic_band_averages",
    """
SELECT round(avg(l_quantity), 4) AS avg_qty,
       round(avg(o_totalprice), 4) AS avg_price,
       round(sum(l_extendedprice), 2) AS rev
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE (c_mktsegment = 'BUILDING' AND o_totalprice BETWEEN 50000 AND 200000 AND l_quantity BETWEEN 1 AND 25)
   OR (c_mktsegment = 'AUTOMOBILE' AND o_totalprice BETWEEN 100000 AND 300000 AND l_quantity BETWEEN 26 AND 50)
""",
    "q13: single aggregate row over disjunctive demographic/band "
    "predicate pairs — the OR-of-conjunctions filter feeding three "
    "different aggregates at once.",
)


_register(
    "tpcds_q16_distinct_count_not_exists",
    """
SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) AS order_cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders o1
JOIN customer ON o1.o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE n_name IN ('FRANCE', 'GERMANY', 'EGYPT')
  AND o1.o_orderpriority = '1-URGENT'
  AND EXISTS (SELECT 1 FROM lineitem l1
              WHERE l1.l_orderkey = o1.o_orderkey AND l1.l_discount > 0.05)
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = o1.o_orderkey AND l2.l_returnflag = 'R')
""",
    "q16: distinct-count + EXISTS + NOT EXISTS pair on the same fact "
    "with an IN-list dimension filter — semi and anti join against "
    "the identical child relation.",
)


def _register_pair(name: str, spark_sql: str, oracle_sql: str, doc: str):
    def _q(spark: SparkSession, sf_dir: str, _s=spark_sql) -> DataFrame:
        return _sql(spark, sf_dir, _s)

    _q.__doc__ = doc
    _q.__name__ = name
    return query(name, oracle=oracle_sql, tags=("tpcds-shape",))(_q)


_register_pair(
    "tpcds_q88_multi_scalar_row",
    _Q88_SPARK,
    _Q88_ORACLE,
    "TPC-DS q88 shape: five scalar-subquery scans fused into a single "
    "output row (r12 Spark side: ONE conditional-aggregate scan; the "
    "oracle keeps the literal subquery text — see the comment at "
    "_Q88_SPARK).",
)

_register_pair(
    "tpcds_q9_case_band_subqueries",
    _Q9_SPARK,
    _Q9_ORACLE,
    "q9: CASE selecting between pairs of scalar subqueries per quantity "
    "band — nine scalar subqueries over one fact, the multi-scalar "
    "fusion stress (r12 Spark side: ONE conditional-aggregate pass; "
    "the oracle keeps the literal nine-subquery text — see the "
    "comment at _Q9_SPARK).",
)


_Q43_SPARK = """
SELECT n_name,
       round(sum(CASE WHEN dayofweek(o_orderdate) = 1 THEN o_totalprice ELSE 0 END), 2) AS sun_sales,
       round(sum(CASE WHEN dayofweek(o_orderdate) = 2 THEN o_totalprice ELSE 0 END), 2) AS mon_sales,
       round(sum(CASE WHEN dayofweek(o_orderdate) = 3 THEN o_totalprice ELSE 0 END), 2) AS tue_sales,
       round(sum(CASE WHEN dayofweek(o_orderdate) = 7 THEN o_totalprice ELSE 0 END), 2) AS sat_sales
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE year(o_orderdate) = 1995
GROUP BY n_name
"""

_register_pair(
    "tpcds_q43_weekday_pivot",
    _Q43_SPARK,
    # DuckDB numbers Sunday=0 — shift to Spark's Sunday=1 scheme
    _Q43_SPARK.replace("dayofweek(o_orderdate)", "(dayofweek(o_orderdate) + 1)"),
    "q43: day-of-week CASE pivot per dimension group — engines number "
    "weekdays differently (Spark dayofweek Sunday=1, DuckDB Sunday=0; "
    "the oracle shifts), one scan, map-side conditional sums.",
)


_register(
    "tpcds_q59_week_over_week_ratio",
    """
WITH weekly AS (
  SELECT n_name, year(o_orderdate) AS yr, weekofyear(o_orderdate) AS wk,
         sum(o_totalprice) AS sales
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE year(o_orderdate) IN (1994, 1995)
  GROUP BY 1, 2, 3
)
SELECT cur.n_name, cur.wk,
       round(cur.sales, 2) AS sales_1995,
       round(prev.sales, 2) AS sales_1994,
       round(cur.sales / prev.sales, 4) AS wow_ratio
FROM weekly cur JOIN weekly prev
  ON cur.n_name = prev.n_name AND cur.wk = prev.wk
 AND cur.yr = 1995 AND prev.yr = 1994
WHERE prev.sales > 0
""",
    "q59: week-over-week self-join of a weekly aggregate CTE across "
    "two years keyed on (dimension, week number) with a ratio output "
    "— the calendar-aligned year comparison shape.",
)


_register(
    "tpcds_q22_rollup_averages",
    """
SELECT p_type, p_brand, p_size,
       round(avg(l_quantity), 4) AS qoh
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE year(l_shipdate) BETWEEN 1994 AND 1995
GROUP BY ROLLUP (p_type, p_brand, p_size)
""",
    "q22: three-level ROLLUP of an average (inventory quantity-on-hand "
    "hierarchy) — Expand with four grouping sets over one scan.",
)


_register(
    "tpcds_q37_price_band_window",
    """
SELECT p_brand, round(min(p_retailprice), 2) AS min_price,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_retailprice BETWEEN 900 AND 1100
  AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-01'
GROUP BY p_brand
HAVING count(DISTINCT l_orderkey) > 0
""",
    "q37/q82: price-band dimension filter joined to a date-windowed "
    "fact, distinct-count per brand (selective band + window pushdown "
    "on both sides of the join).",
)


_register(
    "tpcds_q45_disjunctive_subquery",
    """
SELECT n_name, round(sum(o_totalprice), 2) AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE n_name IN ('JAPAN', 'CHINA', 'INDIA')
   OR c_custkey IN (SELECT o_custkey FROM orders
                    WHERE o_totalprice > 400000)
GROUP BY n_name
""",
    "q45: disjunction of a local IN-list and an IN-subquery — the "
    "shape that forces existence-join handling inside an OR (no naive "
    "semi-join rewrite applies).",
)


_Q50_SPARK = """
SELECT n_name, o_orderpriority,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
       CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) > 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90plus
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE year(o_orderdate) = 1994
GROUP BY n_name, o_orderpriority
"""

_register_pair(
    "tpcds_q50_latency_matrix",
    _Q50_SPARK,
    # Spark datediff(end, start) vs DuckDB date_diff('day', start, end)
    _Q50_SPARK.replace("datediff(l_shipdate, o_orderdate)",
                       "date_diff('day', o_orderdate, l_shipdate)"),
    "q50: order-to-ship latency bucket matrix across two dimensions - "
    "CASE bucket pivot over a date difference (engines differ on "
    "datediff argument conventions; the oracle adapts).",
)


_register(
    "tpcds_q98_class_share_window",
    """
SELECT p_type, p_brand,
       round(sum(l_extendedprice), 2) AS rev,
       round(sum(l_extendedprice) * 100.0 /
             sum(sum(l_extendedprice)) OVER (PARTITION BY p_type), 4) AS revratio
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE year(l_shipdate) = 1995
GROUP BY p_type, p_brand
""",
    "q98/q89 family: per-group revenue share of its class via a window "
    "SUM over the aggregate output (agg feeding a partition-total "
    "window, the percent-of-parent shape).",
)


# ---- r5 batch: 20 further TPC-DS query families (toward the reference's
# 99/99 e2e gate, TpcdsTestProgram.java:76-84). All measures are exact
# integers (cents; e4 share units; floor-half-up avg_cents via
# (2s+n)/(2n)) so the value hash is engine-exact by construction — the
# repo float-determinism rule. ------------------------------------------

_register(
    "tpcds_q3_year_brand_rank",
    """
WITH s AS (
  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr, p_brand,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type IN ('ECONOMY', 'PROMO')
  GROUP BY 1, 2
)
SELECT yr, p_brand, rev_cents,
       CAST(rk AS INT) AS rk
FROM (
  SELECT yr, p_brand, rev_cents,
         rank() OVER (PARTITION BY yr ORDER BY rev_cents DESC, p_brand) AS rk
  FROM s
) t WHERE rk <= 5
""",
    "TPC-DS q3 shape: date-dim star agg with per-year brand revenue "
    "ranking (partitioned window over a filtered star join).",
)

_register(
    "tpcds_q6_above_nation_avg_count",
    """
SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 1.2 * (
  SELECT avg(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c_nationkey
)
GROUP BY n_name
""",
    "TPC-DS q6 shape: correlated scalar AVG subquery as a filter "
    "threshold (customers 20% above their nation's average balance).",
)

_register(
    "tpcds_q7_segment_profile_avgs",
    """
WITH s AS (
  SELECT c_mktsegment,
         CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sq,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sp,
         CAST(sum(CAST(round(l_discount * 10000, 0) AS BIGINT)) AS BIGINT) AS sd,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       CAST(floor((2 * sq + n) / (2.0 * n)) AS BIGINT) AS avg_qty_cents,
       CAST(floor((2 * sp + n) / (2.0 * n)) AS BIGINT) AS avg_price_cents,
       CAST(floor((2 * sd + n) / (2.0 * n)) AS BIGINT) AS avg_disc_e4,
       n
FROM s
""",
    "TPC-DS q7 shape: multi-measure demographic profile averages over a "
    "3-way star join (avgs in exact floor-half-up integer units).",
)

_register(
    "tpcds_q8_name_prefix_revenue",
    """
SELECT substring(c_name, 1, 10) AS name_prefix,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE substring(c_name, 1, 10) IN ('Customer#1', 'Customer#2', 'Customer#3')
GROUP BY 1
""",
    "TPC-DS q8 shape: substring-prefix dimension filter + aggregation "
    "(the zip-prefix store filter).",
)

_register(
    "tpcds_q12_type_revenue_share",
    """
WITH s AS (
  SELECT p_type, p_brand,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type, p_brand
)
SELECT p_type, p_brand, rev_cents,
       CAST(floor((20000 * rev_cents + sum(rev_cents) OVER (PARTITION BY p_type))
            / (2.0 * sum(rev_cents) OVER (PARTITION BY p_type))) AS BIGINT) AS share_e4
FROM s
""",
    "TPC-DS q12/q98 family: per-class revenue share via a windowed "
    "total over the aggregate (ratio_to_report), exact e4 units.",
)

_register(
    "tpcds_q15_disjunctive_exists_agg",
    """
SELECT n_name, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE n_name IN ('CHINA', 'FRANCE', 'KENYA')
   OR o_totalprice > 400000
GROUP BY n_name
""",
    "TPC-DS q15 shape: disjunctive geography-or-value predicate over a "
    "star join (catalog sales zip/amount OR filter).",
)

_register(
    "tpcds_q18_rollup_channel_avgs",
    """
WITH s AS (
  SELECT n_name, c_mktsegment,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sp,
         CAST(count(*) AS BIGINT) AS n
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY ROLLUP (n_name, c_mktsegment)
)
SELECT n_name, c_mktsegment,
       CAST(floor((2 * sp + n) / (2.0 * n)) AS BIGINT) AS avg_order_cents, n
FROM s
""",
    "TPC-DS q18 shape: ROLLUP over two demographic dimensions with "
    "average measures computed from exact integer sufficient stats.",
)

_register(
    "tpcds_q19_cross_nation_brand_revenue",
    """
SELECT p_brand,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_nationkey <> s_nationkey
GROUP BY p_brand
""",
    "TPC-DS q19 shape: brand revenue where the buyer and seller sit in "
    "different geographies (the customer-zip <> store-zip clause).",
)

_register(
    "tpcds_q28_quantity_band_panel",
    """
SELECT b1.avg_cents AS band1_avg_cents, b1.nd AS band1_brands,
       b2.avg_cents AS band2_avg_cents, b2.nd AS band2_brands,
       b3.avg_cents AS band3_avg_cents, b3.nd AS band3_brands
FROM
 (SELECT CAST(floor((2 * sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) + count(*))
         / (2.0 * count(*))) AS BIGINT) AS avg_cents,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd
  FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) b1,
 (SELECT CAST(floor((2 * sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) + count(*))
         / (2.0 * count(*))) AS BIGINT) AS avg_cents,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd
  FROM lineitem WHERE l_quantity BETWEEN 11 AND 25) b2,
 (SELECT CAST(floor((2 * sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) + count(*))
         / (2.0 * count(*))) AS BIGINT) AS avg_cents,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd
  FROM lineitem WHERE l_quantity BETWEEN 26 AND 50) b3
""",
    "TPC-DS q28 shape: one output row glued from independent "
    "quantity-band scans, each with an average AND a DISTINCT count "
    "(distinct-aggregate multi-scan fusion).",
)

_register(
    "tpcds_q30_returns_above_nation_avg",
    """
WITH ret AS (
  SELECT o_custkey, c_nationkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS ret_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey, c_nationkey
)
SELECT r.o_custkey AS custkey, r.ret_cents
FROM ret r
WHERE r.ret_cents > 1.2 * (
  SELECT avg(r2.ret_cents) FROM ret r2 WHERE r2.c_nationkey = r.c_nationkey
)
""",
    "TPC-DS q30 shape: per-customer return total filtered against 1.2x "
    "the geography's average return total (correlated agg over a CTE).",
)

_register(
    "tpcds_q35_exists_profile_stats",
    """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(min(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS min_bal_cents,
       CAST(max(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS max_bal_cents,
       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sum_bal_cents
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY n_name
""",
    "TPC-DS q35 shape: EXISTS + NOT EXISTS channel-membership filters "
    "feeding a multi-statistic demographic profile.",
)

_register(
    "tpcds_q47_monthly_lag_lead",
    """
WITH m AS (
  SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
         CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS mo,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
  GROUP BY 1, 2, 3
)
SELECT p_brand, yr, mo, rev_cents,
       lag(rev_cents) OVER w AS prev_cents,
       lead(rev_cents) OVER w AS next_cents
FROM m
WINDOW w AS (PARTITION BY p_brand ORDER BY yr, mo)
""",
    "TPC-DS q47 shape: monthly series with BOTH lag and lead neighbor "
    "columns over the same window (v1/v2 deviation companion cols).",
)

_register(
    "tpcds_q53_quarter_vs_year_share",
    """
WITH q AS (
  SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
         CAST(EXTRACT(QUARTER FROM l_shipdate) AS INT) AS qtr,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3
)
SELECT p_brand, yr, qtr, rev_cents,
       CAST(floor((20000 * rev_cents + sum(rev_cents) OVER (PARTITION BY p_brand, yr))
            / (2.0 * sum(rev_cents) OVER (PARTITION BY p_brand, yr))) AS BIGINT) AS share_of_year_e4
FROM q
""",
    "TPC-DS q53/q63 family: quarterly revenue as an exact e4 share of "
    "the brand's yearly total (window sum over a grouped series).",
)

_register(
    "tpcds_q69_active_never_returned",
    """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem JOIN orders o2 ON l_orderkey = o2.o_orderkey
    WHERE o2.o_custkey = c_custkey AND l_returnflag = 'R'
  )
GROUP BY c_mktsegment
""",
    "TPC-DS q69 shape: purchased-but-never-returned cohort via EXISTS "
    "against one fact and NOT EXISTS against a joined second fact.",
)

_register(
    "tpcds_q70_rank_within_rollup",
    """
WITH s AS (
  SELECT r_name, n_name,
         CAST(grouping(r_name) AS INT) AS g_region,
         CAST(grouping(n_name) AS INT) AS g_nation,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY ROLLUP (r_name, n_name)
)
SELECT r_name, n_name, g_region, g_nation, rev_cents,
       CAST(CASE WHEN g_nation = 0 AND g_region = 0 THEN
         rank() OVER (PARTITION BY g_region, g_nation, r_name
                      ORDER BY rev_cents DESC, n_name)
       ELSE 0 END AS INT) AS rk_in_region
FROM s
""",
    "TPC-DS q70 shape: rank computed INSIDE rollup leaf groups "
    "(grouping() columns scope the window partitions — lochierarchy "
    "ranking with in-group ordering).",
)

_register(
    "tpcds_q77_sales_vs_returns_rollup",
    """
WITH sales AS (
  SELECT s_nationkey AS nk,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sales_cents
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE l_returnflag <> 'R' GROUP BY s_nationkey
),
rets AS (
  SELECT s_nationkey AS nk,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS ret_cents
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE l_returnflag = 'R' GROUP BY s_nationkey
)
SELECT n_name,
       CAST(sum(coalesce(s.sales_cents, 0)) AS BIGINT) AS sales_cents,
       CAST(sum(coalesce(r.ret_cents, 0)) AS BIGINT) AS ret_cents,
       CAST(sum(coalesce(s.sales_cents, 0)) - sum(coalesce(r.ret_cents, 0)) AS BIGINT) AS net_cents
FROM sales s
FULL OUTER JOIN rets r ON s.nk = r.nk
JOIN nation ON n_nationkey = coalesce(s.nk, r.nk)
GROUP BY ROLLUP (n_name)
""",
    "TPC-DS q77/q80 family: per-channel sales vs returns netted through "
    "a FULL OUTER join of two aggregates, totaled with ROLLUP.",
)

_register(
    "tpcds_q94_multi_supplier_clean_orders",
    """
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(total_cents) AS BIGINT) AS total_cents
FROM (
  SELECT o_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY o_orderkey
  HAVING count(DISTINCT l_suppkey) >= 2
     AND sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 0
) t
""",
    "TPC-DS q94 shape: orders shipped by 2+ distinct warehouses with "
    "zero returned items (distinct-count + conditional-sum HAVING).",
)

_register(
    "tpcds_q96_hour_band_traffic",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events
WHERE CAST(EXTRACT(HOUR FROM ts) AS INT) BETWEEN 8 AND 11
GROUP BY event_type
""",
    "TPC-DS q96 shape: time-of-day band traffic count (hour extraction "
    "as the dimension filter).",
)

_register(
    "tpcds_q97_channel_overlap_matrix",
    """
WITH open_c AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
     filled_c AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
SELECT
  CAST(sum(CASE WHEN o.k IS NOT NULL AND f.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS open_only,
  CAST(sum(CASE WHEN o.k IS NULL AND f.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS filled_only,
  CAST(sum(CASE WHEN o.k IS NOT NULL AND f.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_channels
FROM open_c o FULL OUTER JOIN filled_c f ON o.k = f.k
""",
    "TPC-DS q97 shape: channel-overlap matrix — FULL OUTER join of two "
    "DISTINCT customer sets folded into only/only/both counts.",
)

_register(
    "tpcds_q99_latency_matrix_two_dims",
    """
SELECT yr, o_orderpriority,
  CAST(sum(CASE WHEN mdelay <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS within_1mo,
  CAST(sum(CASE WHEN mdelay = 2 THEN 1 ELSE 0 END) AS BIGINT) AS mo_2,
  CAST(sum(CASE WHEN mdelay > 2 THEN 1 ELSE 0 END) AS BIGINT) AS over_2mo,
  CAST(count(*) AS BIGINT) AS total
FROM (
  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
         o_orderpriority,
         (year(l_shipdate) * 12 + month(l_shipdate))
         - (year(o_orderdate) * 12 + month(o_orderdate)) AS mdelay
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
) t
GROUP BY yr, o_orderpriority
""",
    "TPC-DS q99 shape: the latency histogram as a TWO-dimensional "
    "matrix (ship year x priority — q62's single-dim histogram keyed "
    "on a second dimension, the month x ship-mode x call-center pivot).",
)

_register(
    "tpcds_q34_band_cohort_details",
    """
WITH cnt AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
  HAVING count(*) BETWEEN 15 AND 20
)
SELECT c_custkey, c_name, c_mktsegment, n_orders
FROM cnt JOIN customer ON c_custkey = o_custkey
""",
    "TPC-DS q34/q46/q68/q79 family: a trip-count band cohort computed "
    "on the fact table, then JOINED BACK to the dimension for detail "
    "rows (q73 stops at the counts; the join-back is the family's "
    "second half).",
)


# ---- r7 batch: the 28 remaining TPC-DS query families (closing the
# inventory at 99/99 vs the reference's e2e gate,
# flink-end-to-end-tests/flink-tpcds-test/.../TpcdsTestProgram.java:76-84).
# Same discipline as the r5 batch: every measure is an exact integer
# (cents; e4 discount/share/tax units; cents*e4 for price*discount
# products; floor-half-up averages via (2s+n)/(2n)) so the driver's
# bit-level value hash is engine-exact by construction. Date filters sit
# inside the fixture's 1995-2001 span so no query is vacuously empty.

_register(
    "tpcds_q2_weekly_channel_ratio",
    """
WITH combined AS (
  SELECT o_orderdate AS d, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  UNION ALL
  SELECT l_shipdate AS d, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem
),
weekly AS (
  SELECT CAST(year(d) AS INT) AS yr, CAST(weekofyear(d) AS INT) AS wk,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM combined WHERE year(d) IN (1995, 1996) GROUP BY 1, 2
)
SELECT cur.wk, cur.cents AS cents_1996, prev.cents AS cents_1995,
       CAST(floor((20000 * cur.cents + prev.cents) / (2.0 * prev.cents)) AS BIGINT) AS wow_ratio_e4
FROM weekly cur JOIN weekly prev ON cur.wk = prev.wk
WHERE cur.yr = 1996 AND prev.yr = 1995 AND prev.cents > 0
""",
    "TPC-DS q2 shape: two channels UNION ALLed into one dated fact, "
    "rolled up per ISO week, then self-joined across adjacent years on "
    "the week number for a calendar-aligned ratio (exact e4 units).",
)

_register(
    "tpcds_q11_channel_growth_compare",
    """
WITH yearly AS (
  SELECT o_custkey, o_orderstatus AS chan, CAST(year(o_orderdate) AS INT) AS yr,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus IN ('O', 'F') AND year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3
)
SELECT s1.o_custkey AS custkey,
       s1.cents AS store_1995_cents, s2.cents AS store_1996_cents,
       w1.cents AS web_1995_cents,   w2.cents AS web_1996_cents
FROM yearly s1
JOIN yearly s2 ON s2.o_custkey = s1.o_custkey AND s2.chan = 'F' AND s2.yr = 1996
JOIN yearly w1 ON w1.o_custkey = s1.o_custkey AND w1.chan = 'O' AND w1.yr = 1995
JOIN yearly w2 ON w2.o_custkey = s1.o_custkey AND w2.chan = 'O' AND w2.yr = 1996
WHERE s1.chan = 'F' AND s1.yr = 1995
  AND s1.cents > 0 AND w1.cents > 0
  AND w2.cents * s1.cents > s2.cents * w1.cents
""",
    "TPC-DS q11 shape (q74's big sibling): per-customer year-over-year "
    "totals for TWO channels, four-way self-join, keeping customers "
    "whose web growth ratio beats their store growth ratio — the ratio "
    "comparison is cross-multiplied so it stays in exact integers.",
)

_register(
    "tpcds_q20_windowed_class_share",
    """
WITH s AS (
  SELECT p_type, p_size,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate BETWEEN DATE '1995-02-01' AND DATE '1995-03-02'
  GROUP BY p_type, p_size
)
SELECT p_type, p_size, rev_cents,
       CAST(floor((20000 * rev_cents + sum(rev_cents) OVER (PARTITION BY p_type))
            / (2.0 * sum(rev_cents) OVER (PARTITION BY p_type))) AS BIGINT) AS share_e4
FROM s
""",
    "TPC-DS q20 shape: 30-day date-windowed catalog revenue share of "
    "class within category (q12's ratio_to_report window constrained "
    "to a date window that must push down to the fact scan).",
)

_register(
    "tpcds_q24_spend_above_global_threshold",
    """
WITH ss AS (
  SELECT c_custkey, c_name, p_brand,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS paid_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, p_brand, paid_cents
FROM ss
WHERE 10 * paid_cents * (SELECT CAST(count(*) AS BIGINT) FROM ss)
      > 13 * (SELECT CAST(sum(paid_cents) AS BIGINT) FROM ss)
""",
    "TPC-DS q24 shape: per-(customer, brand) returned spend filtered "
    "against a scalar threshold computed over the SAME aggregate CTE "
    "(1.3x the global average, cross-multiplied to exact integers) — "
    "the CTE is scanned three times, once as fact and twice as scalars.",
)

_register(
    "tpcds_q25_three_channel_chain",
    """
WITH sold AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1
),
ret AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
),
reb AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1
)
SELECT p_brand,
       CAST(sum(sold.cents) AS BIGINT) AS sold_cents,
       CAST(sum(ret.cents) AS BIGINT) AS returned_cents,
       CAST(sum(reb.cents) AS BIGINT) AS rebought_cents
FROM sold
JOIN ret ON ret.l_partkey = sold.l_partkey
JOIN reb ON reb.l_partkey = sold.l_partkey
JOIN part ON p_partkey = sold.l_partkey
GROUP BY p_brand
""",
    "TPC-DS q25/q29 chain shape: three per-item channel aggregates "
    "(sold, returned, re-bought) inner-joined on the item key — only "
    "items present in ALL three channels survive — then rolled up per "
    "brand. Pre-aggregating each channel before the join keeps the "
    "join keys unique (no fact-x-fact row explosion at scale).",
)

_register(
    "tpcds_q26_catalog_profile_avgs",
    """
WITH s AS (
  SELECT p_type,
         CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sq,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sp,
         CAST(sum(CAST(round(l_discount * 10000, 0) AS BIGINT)) AS BIGINT) AS sd,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY p_type
)
SELECT p_type,
       CAST(floor((2 * sq + n) / (2.0 * n)) AS BIGINT) AS avg_qty_cents,
       CAST(floor((2 * sp + n) / (2.0 * n)) AS BIGINT) AS avg_price_cents,
       CAST(floor((2 * sd + n) / (2.0 * n)) AS BIGINT) AS avg_disc_e4,
       n
FROM s
""",
    "TPC-DS q26 shape (q7's catalog-channel sibling): demographic "
    "profile averages per item class for the urgent-priority cohort, "
    "floor-half-up integer averages from exact sufficient stats.",
)

_register(
    "tpcds_q27_rollup_item_geography",
    """
WITH s AS (
  SELECT n_name, p_brand,
         CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sq,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN part ON l_partkey = p_partkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY ROLLUP (n_name, p_brand)
)
SELECT n_name, p_brand,
       CAST(floor((2 * sq + n) / (2.0 * n)) AS BIGINT) AS avg_qty_cents, n
FROM s
""",
    "TPC-DS q27 shape: ROLLUP over (geography, item) of a segment "
    "cohort's average quantity — q18 rolls up demographics; q27 mixes "
    "a dimension from each side of the 5-way star.",
)

_register(
    "tpcds_q32_excess_discount_total",
    """
WITH d AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_discount * 10000, 0) AS BIGINT)) AS BIGINT) AS sd,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l1.l_extendedprice * 100, 0) AS BIGINT)
             * CAST(round(l1.l_discount * 10000, 0) AS BIGINT)) AS BIGINT) AS excess_cents_e4
FROM lineitem l1
JOIN part ON l1.l_partkey = p_partkey
JOIN d ON d.l_partkey = l1.l_partkey
WHERE p_size BETWEEN 1 AND 15
  AND CAST(round(l1.l_discount * 10000, 0) AS BIGINT) * 10 * d.n > 13 * d.sd
""",
    "TPC-DS q32 shape: total discount amount on lines discounted more "
    "than 1.3x their item's average discount — the per-item average is "
    "carried as exact (sum_e4, count) sufficient stats and the 1.3x "
    "comparison is cross-multiplied, so no float ever decides a row. "
    "q92 reports the per-item variant; q32 is the single-row total.",
)

_register(
    "tpcds_q40_net_sales_around_pivot",
    """
SELECT n_name,
  CAST(sum(CASE WHEN l_shipdate <  DATE '1995-06-01'
                THEN CASE WHEN l_returnflag = 'R'
                          THEN -CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                          ELSE  CAST(round(l_extendedprice * 100, 0) AS BIGINT) END
                ELSE 0 END) AS BIGINT) AS net_before_cents,
  CAST(sum(CASE WHEN l_shipdate >= DATE '1995-06-01'
                THEN CASE WHEN l_returnflag = 'R'
                          THEN -CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                          ELSE  CAST(round(l_extendedprice * 100, 0) AS BIGINT) END
                ELSE 0 END) AS BIGINT) AS net_after_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l_shipdate BETWEEN DATE '1995-05-01' AND DATE '1995-07-01'
GROUP BY n_name
""",
    "TPC-DS q40 shape: returns-netted sales split before/after a pivot "
    "date per warehouse geography (q21 ratios gross sales; q40 nets "
    "returns as negative contributions inside each half).",
)

_register(
    "tpcds_q42_year_category_revenue",
    """
SELECT CAST(year(l_shipdate) AS INT) AS yr, p_type,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE year(l_shipdate) = 1995 AND month(l_shipdate) = 11
GROUP BY 1, 2
""",
    "TPC-DS q42 shape: single-month category revenue star aggregate — "
    "the minimal date-dim + item-dim star join the q42/q52/q55 trio "
    "shares, here keyed on category.",
)

_register(
    "tpcds_q46_out_of_town_trips",
    """
WITH trips AS (
  SELECT o_orderkey, o_custkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS amt_cents,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(max(s_nationkey) AS BIGINT) AS supp_nation
  FROM orders
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY o_orderkey, o_custkey
  HAVING count(DISTINCT s_nationkey) = 1
)
SELECT c_name, c_custkey, o_orderkey, amt_cents, n_items
FROM trips JOIN customer ON c_custkey = o_custkey
WHERE supp_nation <> CAST(c_nationkey AS BIGINT)
""",
    "TPC-DS q46 shape: per-trip aggregate restricted to single-source "
    "trips (HAVING count(DISTINCT supplier-geo) = 1), joined back to "
    "the customer and kept only where the trip's geography differs "
    "from the customer's home geography (bought_city <> home city).",
)

_register(
    "tpcds_q52_year_brand_revenue",
    """
SELECT CAST(year(l_shipdate) AS INT) AS yr, p_brand,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE year(l_shipdate) = 1996 AND month(l_shipdate) = 12
GROUP BY 1, 2
""",
    "TPC-DS q52 shape: single-month brand revenue (the q42 star keyed "
    "on brand instead of category — the trio's second member).",
)

_register(
    "tpcds_q55_manager_brand_revenue",
    """
SELECT p_brand,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type = 'STANDARD' AND year(l_shipdate) = 1995 AND month(l_shipdate) = 3
GROUP BY p_brand
""",
    "TPC-DS q55 shape: one manager's (here: one category's) brand "
    "revenue for one month — the q42/q52/q55 trio's third member, "
    "with the selective dimension filter on the item side.",
)

_register(
    "tpcds_q56_color_items_channel_union",
    """
WITH chan AS (
  SELECT l_partkey, l_returnflag AS chan,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem
),
per_chan AS (
  SELECT p_brand, chan, CAST(sum(cents) AS BIGINT) AS cents
  FROM chan JOIN part ON l_partkey = p_partkey
  WHERE split_part(p_name, ' ', 1) IN ('red', 'blue', 'ivory')
  GROUP BY p_brand, chan
)
SELECT p_brand, CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n_channels
FROM per_chan GROUP BY p_brand
""",
    "TPC-DS q56 shape: color-list item filter (first word of the item "
    "name) aggregated per channel, then re-aggregated across channels "
    "per item dimension — the q56/q60 cross-channel color rollup.",
)

_register(
    "tpcds_q60_category_channel_union",
    """
WITH u AS (
  SELECT l_partkey, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem WHERE l_returnflag = 'N'
  UNION ALL
  SELECT l_partkey, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem WHERE l_returnflag = 'A'
  UNION ALL
  SELECT l_partkey, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem WHERE l_returnflag = 'R'
)
SELECT p_type, CAST(sum(cents) AS BIGINT) AS total_cents
FROM u JOIN part ON l_partkey = p_partkey
WHERE p_type IN ('ECONOMY', 'PROMO')
GROUP BY p_type
""",
    "TPC-DS q60 shape: explicit three-branch UNION ALL of channel "
    "scans re-aggregated per item category — unlike q56's tagged "
    "single scan, the planner sees three scans it must prune the "
    "category filter into (via the join) before the union.",
)

_register(
    "tpcds_q63_monthly_vs_annual_avg",
    """
WITH monthly AS (
  SELECT p_brand, CAST(year(l_shipdate) AS INT) AS yr, CAST(month(l_shipdate) AS INT) AS mo,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2, 3
)
SELECT p_brand, yr, mo, cents, yr_cents
FROM (
  SELECT p_brand, yr, mo, cents,
         CAST(sum(cents) OVER (PARTITION BY p_brand, yr) AS BIGINT) AS yr_cents
  FROM monthly
) t
WHERE abs(12 * cents - yr_cents) * 10 > yr_cents
""",
    "TPC-DS q63 shape (q53/q89 family): monthly manager sales kept "
    "only where the month deviates more than 10% from the yearly "
    "average — the deviation test is |12m - y| * 10 > y in exact "
    "integers (no float average ever materializes).",
)

_register(
    "tpcds_q68_trip_measure_breakout",
    """
WITH trips AS (
  SELECT o_orderkey, o_custkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_cents,
         CAST(sum(CAST(round(l_tax * 10000, 0) AS BIGINT)) AS BIGINT) AS tax_e4,
         CAST(sum(CAST(round(l_discount * 10000, 0) AS BIGINT)) AS BIGINT) AS disc_e4
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY o_orderkey, o_custkey
  HAVING count(*) BETWEEN 5 AND 10
)
SELECT c_name, c_custkey, o_orderkey, price_cents, tax_e4, disc_e4
FROM trips JOIN customer ON c_custkey = o_custkey
""",
    "TPC-DS q68 shape: the trip-cohort join-back (q34/q46 family) "
    "carrying THREE separate per-trip money measures (price, tax, "
    "discount) through the HAVING band to the detail output.",
)

_register(
    "tpcds_q71_hourly_channel_brands",
    """
WITH u AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, value FROM events WHERE event_type = 'view'
)
SELECT CAST(EXTRACT(HOUR FROM ts) AS INT) AS hr,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS val_cents,
       CAST(count(*) AS BIGINT) AS n
FROM u
GROUP BY 1
""",
    "TPC-DS q71 shape: three channel scans UNION ALLed then bucketed "
    "by hour of day (the breakfast/dinner time-dim join) — the time "
    "dimension comes from the event timestamp, the union from the "
    "channel split.",
)

_register(
    "tpcds_q76_sparse_attribute_census",
    """
WITH u AS (
  SELECT 'tax0' AS reason, CAST(year(l_shipdate) AS INT) AS yr, l_returnflag AS chan,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem WHERE l_tax = 0
  UNION ALL
  SELECT 'disc0' AS reason, CAST(year(l_shipdate) AS INT) AS yr, l_returnflag AS chan,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem WHERE l_discount = 0
)
SELECT reason, yr, chan, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS cents
FROM u GROUP BY 1, 2, 3
""",
    "TPC-DS q76 shape: census of fact rows with a degenerate/missing "
    "attribute per channel — each branch scans the fact with a "
    "different sparse-attribute predicate (zero tax / zero discount "
    "standing in for the null surrogate keys), UNION ALL, then a "
    "(reason, year, channel) count-and-sum rollup.",
)

_register(
    "tpcds_q79_best_trip_per_customer",
    """
WITH per_order AS (
  SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
              * (10000 - CAST(round(l_discount * 10000, 0) AS BIGINT))) AS BIGINT) AS profit_ce4
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_custkey, o_orderkey
)
SELECT c_name, c_custkey, o_orderkey, profit_ce4
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY profit_ce4 DESC, o_orderkey) AS rn
  FROM per_order
) t
JOIN customer ON c_custkey = o_custkey
WHERE rn = 1
""",
    "TPC-DS q79 shape: each customer's most profitable trip — per-trip "
    "discounted profit in exact cents*e4 units, a per-customer top-1 "
    "window (deterministic orderkey tie-break), then the dimension "
    "join-back for names.",
)

_register(
    "tpcds_q80_channel_returns_rollup",
    """
WITH base AS (
  SELECT l_returnflag AS chan, n_name,
         CASE WHEN l_returnflag = 'R' THEN 0
              ELSE CAST(round(l_extendedprice * 100, 0) AS BIGINT) END AS sold_cents,
         CASE WHEN l_returnflag = 'R'
              THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) ELSE 0 END AS ret_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE year(l_shipdate) = 1996
)
SELECT chan, n_name,
       CAST(sum(sold_cents) AS BIGINT) AS sales_cents,
       CAST(sum(ret_cents) AS BIGINT) AS returns_cents,
       CAST(sum(sold_cents) - sum(ret_cents) AS BIGINT) AS net_cents
FROM base GROUP BY ROLLUP (chan, n_name)
""",
    "TPC-DS q80 shape: sales / returns / net profit per channel and "
    "geography with a two-level ROLLUP over the channel x location "
    "hierarchy (q77's rollup with returns netted into the measures).",
)

_register(
    "tpcds_q81_returners_above_nation_avg",
    """
WITH ret AS (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS ret_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2, 3, 4
),
nat AS (
  SELECT n_name, CAST(sum(ret_cents) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM ret GROUP BY n_name
)
SELECT r.c_custkey, r.c_name, r.c_acctbal, r.n_name, r.ret_cents
FROM ret r JOIN nat ON r.n_name = nat.n_name
WHERE 10 * r.ret_cents * nat.n > 12 * nat.s
""",
    "TPC-DS q81 shape (q30's detail sibling): customers whose returns "
    "exceed 1.2x their geography's average, emitting the full customer "
    "detail row — the threshold is (sum, count) cross-multiplied, and "
    "the per-nation stats reuse the same aggregate CTE.",
)

_register(
    "tpcds_q82_inventory_band_suppliers",
    """
SELECT p_brand, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS qty_cents
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_retailprice BETWEEN 940 AND 980
  AND l_quantity BETWEEN 20 AND 30
GROUP BY p_brand, p_size
""",
    "TPC-DS q82 shape (q37's store sibling): items in a retail-price "
    "band with demand in a quantity band, counting distinct suppliers "
    "per (brand, size) — both band filters must push into their scans "
    "before the join.",
)

_register(
    "tpcds_q83_return_share_three_periods",
    """
WITH r1 AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem WHERE l_returnflag = 'R' AND month(l_shipdate) BETWEEN 1 AND 4 GROUP BY 1
),
r2 AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem WHERE l_returnflag = 'R' AND month(l_shipdate) BETWEEN 5 AND 8 GROUP BY 1
),
r3 AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem WHERE l_returnflag = 'R' AND month(l_shipdate) BETWEEN 9 AND 12 GROUP BY 1
)
SELECT r1.l_partkey AS partkey, r1.q AS q1, r2.q AS q2, r3.q AS q3,
       CAST(floor((20000 * r1.q + (r1.q + r2.q + r3.q)) / (2.0 * (r1.q + r2.q + r3.q))) AS BIGINT) AS share1_e4
FROM r1
JOIN r2 ON r2.l_partkey = r1.l_partkey
JOIN r3 ON r3.l_partkey = r1.l_partkey
""",
    "TPC-DS q83 shape: three return channels (period slices) joined "
    "per item, each item's first-channel share of its total returned "
    "quantity in exact e4 units — the sr/cr/wr equal-share triangle.",
)

_register(
    "tpcds_q84_customer_identification",
    """
SELECT c_custkey, c_name, n_name, r_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_acctbal BETWEEN 1000 AND 1500 AND c_mktsegment = 'AUTOMOBILE'
""",
    "TPC-DS q84 shape: pure snowflake identification lookup — a "
    "customer attribute band plus segment filter walked out through "
    "two dimension levels with NO aggregation; the planner should "
    "broadcast both dims and keep the filter on the probe side.",
)

_register(
    "tpcds_q85_banded_return_reasons",
    """
WITH s AS (
  SELECT l_linestatus AS reason,
         CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sq,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sp,
         CAST(sum(CAST(round(l_discount * 10000, 0) AS BIGINT)) AS BIGINT) AS sd,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND ((l_quantity BETWEEN 1 AND 20 AND o_totalprice BETWEEN 0 AND 150000)
      OR (l_quantity BETWEEN 21 AND 35 AND o_totalprice BETWEEN 150000 AND 300000)
      OR (l_quantity BETWEEN 36 AND 50 AND o_totalprice BETWEEN 300000 AND 500000))
  GROUP BY 1
)
SELECT reason,
       CAST(floor((2 * sq + n) / (2.0 * n)) AS BIGINT) AS avg_qty_cents,
       CAST(floor((2 * sp + n) / (2.0 * n)) AS BIGINT) AS avg_price_cents,
       CAST(floor((2 * sd + n) / (2.0 * n)) AS BIGINT) AS avg_disc_e4,
       n
FROM s
""",
    "TPC-DS q85 shape: web-returns reason profile under PAIRED band "
    "disjunctions (each quantity band valid only with its matching "
    "order-value band — the correlated-band OR that defeats naive "
    "single-column range pruning), exact integer averages per reason.",
)

_register(
    "tpcds_q86_rollup_rank_regions",
    """
WITH agg AS (
  SELECT r_name, n_name,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
         CAST(grouping(r_name) + grouping(n_name) AS INT) AS lochierarchy,
         CASE WHEN grouping(n_name) = 1 THEN NULL ELSE r_name END AS parent
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY ROLLUP (r_name, n_name)
)
SELECT r_name, n_name, cents, lochierarchy,
       CAST(rank() OVER (PARTITION BY lochierarchy, parent
                         ORDER BY cents DESC, coalesce(n_name, ''), coalesce(r_name, '')) AS INT) AS rk
FROM agg
""",
    "TPC-DS q86 shape: the lochierarchy ROLLUP-rank on the geography "
    "snowflake — grouping()-derived hierarchy level, rank partitioned "
    "by (level, parent) so siblings compete only within their parent "
    "(q36 ranks item hierarchy; q70 gates states by a subquery; q86 "
    "is the plain two-level regional form).",
)

_register(
    "tpcds_q91_returns_loss_by_month",
    """
SELECT n_name, CAST(month(o_orderdate) AS INT) AS mo,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS loss_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R' AND year(o_orderdate) = 1995
  AND c_mktsegment IN ('MACHINERY', 'HOUSEHOLD')
GROUP BY 1, 2
""",
    "TPC-DS q91 shape: call-center returns loss per (center-geography, "
    "month) for targeted demographic segments — a selective 4-way star "
    "with the returns filter on the fact and the segment filter on the "
    "customer dimension.",
)


# ---- a/b variant siblings (TpcdsTestProgram.java:76-84 runs 103 files:
# the 99 families plus 14a/b, 23a/b, 24a/b, 39a/b). The b-variants'
# DISTINGUISHING structure, adapted to the fixture schema like every
# shape above; the a-structures are the previously registered family
# entries (tpcds_q14_cross_channel_intersect, tpcds_q23_frequent_buyers,
# tpcds_q24_spend_above_global_threshold, tpcds_q39_consecutive_cov).

_register(
    "tpcds_q14b_yoy_cross_channel",
    """
WITH both_chan AS (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
),
yr AS (
  SELECT p_brand, year(l_shipdate) AS yr,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem JOIN both_chan b ON lineitem.l_partkey = b.l_partkey
  JOIN part ON lineitem.l_partkey = p_partkey
  WHERE year(l_shipdate) IN (1995, 1996)
  GROUP BY p_brand, year(l_shipdate)
)
SELECT cur.p_brand,
       cur.cents AS rev_this_cents,
       prev.cents AS rev_last_cents
FROM yr cur JOIN yr prev
  ON cur.p_brand = prev.p_brand AND cur.yr = 1996 AND prev.yr = 1995
WHERE 10 * cur.cents < 9 * prev.cents
ORDER BY cur.p_brand
""",
    "TPC-DS q14b shape: where 14a aggregates the cross-channel item "
    "set in one period, 14b compares THIS year vs LAST year for the "
    "same intersect-qualified set (self-join of the yearly aggregate, "
    "declining-revenue filter as integer cross-multiplication).",
)

_register(
    "tpcds_q23b_spend_vs_max",
    """
WITH frequent AS (
  SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 4
), spend AS (
  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), qualified AS (
  SELECT s.o_custkey, s.cents
  FROM spend s WHERE s.o_custkey IN (SELECT o_custkey FROM frequent)
)
SELECT c_name, q.cents AS spend_cents
FROM qualified q JOIN customer ON q.o_custkey = c_custkey
WHERE 2 * q.cents > (SELECT max(cents) FROM qualified)
ORDER BY c_name
""",
    "TPC-DS q23b shape: where 23a ranks the frequency-qualified "
    "spenders top-N, 23b keeps customers whose spend clears a scalar "
    "threshold derived from the SAME qualified CTE's maximum (the "
    "best-customer 95-percent-of-max idiom, exact-integer form) and "
    "joins out the customer names.",
)

_register(
    "tpcds_q24b_spend_above_global_threshold_alt",
    """
WITH ss AS (
  SELECT c_custkey, c_name, p_brand,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS paid_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'A'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, p_brand, paid_cents
FROM ss
WHERE 10 * paid_cents * (SELECT CAST(count(*) AS BIGINT) FROM ss)
      > 15 * (SELECT CAST(sum(paid_cents) AS BIGINT) FROM ss)
""",
    "TPC-DS q24b shape: structurally 24a with the variant's swapped "
    "parameter set (the reference's b-file changes only the color "
    "literal) — different channel slice ('A') and a 1.5x global-average "
    "threshold, still the triple-scan shared-CTE scalar pattern.",
)

_register(
    "tpcds_q39b_cov_pair_strict",
    """
WITH stats AS (
  SELECT l_suppkey, month(l_shipdate) AS mo,
         round(avg(l_quantity), 4) AS mean_q,
         round(stddev_samp(l_quantity), 4) AS std_q
  FROM lineitem WHERE year(l_shipdate) = 1995 AND month(l_shipdate) IN (3, 4)
  GROUP BY l_suppkey, month(l_shipdate)
  HAVING count(*) >= 3 AND avg(l_quantity) > 0 AND stddev_samp(l_quantity) / avg(l_quantity) > 0.5
)
SELECT a.l_suppkey,
       a.mean_q AS mean_m3, a.std_q AS std_m3,
       b.mean_q AS mean_m4, b.std_q AS std_m4
FROM stats a JOIN stats b ON a.l_suppkey = b.l_suppkey AND a.mo = 3 AND b.mo = 4
WHERE CAST(round(a.std_q * 10000, 0) AS BIGINT) * 10
      > CAST(round(a.mean_q * 10000, 0) AS BIGINT) * 6
  AND CAST(round(b.std_q * 10000, 0) AS BIGINT) * 10
      > CAST(round(b.mean_q * 10000, 0) AS BIGINT) * 6
ORDER BY a.l_suppkey
""",
    "TPC-DS q39b shape: 39a's consecutive-period coefficient-of-"
    "variation pairs with the b-variant's EXTRA strictness filter "
    "applied to both periods of the joined pair (the reference's b-file "
    "adds cov >= 1.5 on top of the a-structure). The tightened bound is "
    "an exact-integer cross-multiplication over the e4 images of the "
    "already-rounded stat columns — no float decides row membership "
    "(the project float rule).",
)
