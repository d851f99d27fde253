"""Sketch queries (heavy hitters, HLL cardinality, histogram quantiles,
bloom membership) — operators/sketch.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "sketch_heavy_hitters_users",
    oracle="""
    SELECT user_id, CAST(cnt AS BIGINT) AS cnt, CAST(rank_num AS INT) AS rank_num
    FROM (
      SELECT user_id, count(*) AS cnt,
             row_number() OVER (ORDER BY count(*) DESC, user_id) AS rank_num
      FROM events GROUP BY user_id
    ) WHERE rank_num <= 10
    """,
    tags=("sketch", "heavy-hitters", "custom-op"),
)
def sketch_heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass heavy hitters (per-partition Misra-Gries candidates →
    exact recount): top-10 most active users — identical to the exact
    groupBy top-k (the oracle) because capacity=512 dominates the key
    domain; at 100 TB the same shape bounds memory where the exact
    groupBy's key space would not."""
    from flink_1_16_0_src_spark.operators.sketch import approx_top_k

    ev = load(spark, sf_dir, "events")
    return approx_top_k(ev, "user_id", k=10, capacity=512)


def _hll_oracle() -> str:
    from flink_1_16_0_src_spark.operators.sketch import (
        hll_estimate_x100_sql,
        hll_hash_sql,
    )

    h = hll_hash_sql("user_id", "duckdb")
    return f"""
    WITH r AS (
      SELECT event_type, ({h}) % 64 AS reg, ({h}) // 64 AS rest
      FROM events
    ), ranked AS (
      SELECT event_type, reg,
             27 - CASE WHEN rest = 0 THEN 0 ELSE length(bin(rest)) END AS rnk
      FROM r
    ), regs AS (
      SELECT event_type, reg, max(rnk) AS m FROM ranked GROUP BY 1, 2
    ), z AS (
      SELECT event_type, count(*) AS n_regs,
             sum((1::BIGINT << (27 - m))) AS __z_present
      FROM regs GROUP BY 1
    )
    SELECT event_type, CAST(n_regs AS INT) AS n_regs,
           ({hll_estimate_x100_sql("//")}) / 100.0 AS hll_estimate
    FROM z
    """


@query(
    "sketch_hll_distinct_users",
    oracle=_hll_oracle(),
    tags=("sketch", "hll", "custom-op"),
)
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-parameter HyperLogLog (m=64, Knuth 32-bit hash) distinct
    users per event_type — the oracle implements the identical register
    computation in SQL, so the whole estimator (hashing, register max,
    integer-scaled harmonic sum, one double divide) is value-checked.
    One ≤64·|groups|-row shuffle regardless of input size."""
    from flink_1_16_0_src_spark.operators.sketch import hll_distinct

    ev = load(spark, sf_dir, "events")
    return hll_distinct(ev, "user_id", ["event_type"])


@query(
    "sketch_histogram_quantiles",
    oracle="""
    WITH hist AS (
      SELECT event_type, CAST(floor(value / 1.0) AS BIGINT) AS b,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, b,
             sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cm,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM hist
    ), hit AS (
      SELECT event_type, q, min(b) AS qb
      FROM cum CROSS JOIN (VALUES (0.5, 1, 2), (0.9, 9, 10), (0.99, 99, 100))
                 AS qs(q, qn, qd)
      WHERE cm >= (qn * n + qd - 1) // qd
      GROUP BY 1, 2
    )
    SELECT event_type, q, (qb + 0.5) * 1.0 AS est_value FROM hit
    """,
    tags=("sketch", "quantiles", "custom-op"),
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width-histogram quantile estimate (p50/p90/p99 of
    events.value per event_type, width=1.0): replaces the full sort a
    percentile needs with one ≤ |groups|·491-row histogram shuffle;
    integer cumulative counts make the estimate engine-reproducible.
    Error bound = the bucket width."""
    from flink_1_16_0_src_spark.operators.sketch import histogram_quantiles

    ev = load(spark, sf_dir, "events")
    return histogram_quantiles(ev, "value", ["event_type"], width=1.0)


def _bloom_oracle() -> str:
    from flink_1_16_0_src_spark.operators.sketch import (
        bloom_build_sql,
        bloom_member_sql,
    )

    words = ",\n             ".join(bloom_build_sql("c_custkey", "duckdb"))
    member = bloom_member_sql("user_id", "duckdb")
    return f"""
    WITH f AS (
      SELECT {words}
      FROM customer
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_maybe
    FROM events CROSS JOIN f
    WHERE {member}
    GROUP BY event_type
    """


@query(
    "sketch_bloom_prejoin_filter",
    oracle=_bloom_oracle(),
    tags=("sketch", "bloom", "custom-op"),
)
def sketch_bloom_prejoin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning: fold customer keys into a 960-bit /
    3-hash filter (ONE 16-column bit_or aggregate row), broadcast it,
    and count events per type whose user_id may match — the rows a real
    join would go on to shuffle. The oracle replays the identical
    filter build + probe in SQL, so word packing, double hashing and
    the membership test are all value-checked (no false negatives by
    construction; false positives identical on both engines)."""
    from flink_1_16_0_src_spark.operators.sketch import bloom_semi_filter

    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    kept = bloom_semi_filter(ev, cust, "user_id", "c_custkey")
    return kept.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_maybe")
    )


@query(
    "sketch_count_min_users",
    oracle="""
    WITH keys AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT r.r,
             (('0x' || substr(md5(r.r || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 64) AS b,
             count(*) AS cnt
      FROM events, generate_series(0, 3) r(r)
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT k.user_id, k.true_count, r.r,
             (('0x' || substr(md5(r.r || ':' || CAST(k.user_id AS VARCHAR)), 1, 15))::BIGINT % 64) AS b
      FROM keys k, generate_series(0, 3) r(r)
    )
    SELECT p.user_id, p.true_count,
           CAST(min(c.cnt) AS BIGINT) AS cm_estimate
    FROM probes p JOIN cells c ON c.r = p.r AND c.b = p.b
    GROUP BY p.user_id, p.true_count
    """,
    tags=("sketch", "pipeline", "custom-op"),
)
def sketch_count_min_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005) over
    event user_ids: 4×64 md5-derived counter table + per-key min-probe
    estimates, engine-exact by construction (the oracle rebuilds the
    identical sketch). Mergeable summaries: at 100 TB each partition
    folds to ≤ d·w cells map-side and tables merge cell-wise — the
    same scale story as the HLL/Misra-Gries rows of this family."""
    from flink_1_16_0_src_spark.operators.sketch import count_min_estimates

    ev = load(spark, sf_dir, "events")
    return count_min_estimates(ev, "user_id").select(
        "user_id", "true_count", "cm_estimate"
    )
