"""UNNEST / Correlate / Expand family (SURVEY.md §2.2).

Reference parity: LogicalUnnestRule.scala (UNNEST → Correlate+explode),
EXEC-S/StreamExecCorrelate.java:53 (LATERAL table function),
EXEC-S/StreamExecExpand.java:46 (Expand — exercised via grouping sets
in aggregates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "unnest_array",
    oracle="""
    SELECT p_partkey, unnest(str_split(p_name, ' ')) AS word
    FROM part
    """,
    tags=("unnest",),
)
def unnest_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST(array) → explode (reference LogicalUnnestRule.scala)."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("word"))


@query(
    "unnest_with_ordinality",
    oracle="""
    SELECT p_partkey,
           unnest(str_split(p_name, ' ')) AS word,
           unnest(generate_series(0, len(str_split(p_name, ' ')) - 1)) AS pos
    FROM part
    """,
    tags=("unnest",),
)
def unnest_with_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY → posexplode (DuckDB zips parallel
    unnests positionally — same pairing)."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")).select(
        "p_partkey", "word", "pos"
    )


@query(
    "unnest_outer_empty",
    oracle="""
    SELECT d.doc_id, w.word
    FROM (SELECT doc_id, CASE WHEN lang = 'en' THEN str_split(text, ' ')
                              ELSE [] END AS words
          FROM documents WHERE doc_id < 50) d
    LEFT JOIN LATERAL (SELECT unnest(d.words) AS word) w ON true
    """,
    tags=("unnest",),
)
def unnest_outer_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER UNNEST: empty arrays keep the parent row with NULL
    (explode_outer; Flink UNNEST ... ON TRUE left correlate)."""
    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.when(F.col("lang") == "en", F.split("text", " "))
            .otherwise(F.array().cast("array<string>"))
            .alias("words"),
        )
    )
    return d.select("doc_id", F.explode_outer("words").alias("word"))


@query(
    "lateral_view_split_agg",
    oracle="""
    SELECT word, count(*) AS n, count(DISTINCT p_brand) AS n_brands
    FROM (SELECT p_brand, unnest(str_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
    tags=("unnest", "correlate"),
)
def lateral_view_split_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode + downstream agg (token frequency — the
    Correlate → shuffle-agg pipeline shape)."""
    p = load(spark, sf_dir, "part")
    p.createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT word, count(*) AS n, count(DISTINCT p_brand) AS n_brands
        FROM part LATERAL VIEW explode(split(p_name, ' ')) t AS word
        GROUP BY word
        """
    )


@query(
    "unnest_map_entries",
    oracle="""
    SELECT n_nationkey, 'name' AS key, n_name AS val FROM nation
    UNION ALL
    SELECT n_nationkey, 'region' AS key, CAST(n_regionkey AS VARCHAR) AS val FROM nation
    """,
    tags=("unnest",),
)
def unnest_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST(map) → explode over a MAP column (Flink MAP type §1.3;
    oracle written as the equivalent union since DuckDB maps unnest
    differently)."""
    n = load(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"), F.lit("region"), F.col("n_regionkey").cast("string")
    )
    return n.select("n_nationkey", F.explode(m).alias("key", "val"))


@query(
    "scan_metadata_columns",
    oracle="""
    SELECT 'region.parquet' AS meta_file_name, count(*) AS n
    FROM region GROUP BY 1
    """,
    tags=("scan", "metadata"),
)
def scan_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata columns (SqlCreateTable `METADATA FROM`, SURVEY.md
    §1.4) via Spark's hidden _metadata struct on file sources. The
    fixture is a single file per table, so the oracle pins the exact
    file name as a constant (DuckDB's filename=true equivalent isn't
    reachable through the driver's pre-registered views)."""
    from flink_1_16_0_src_spark.sources import with_metadata_columns

    r = load(spark, sf_dir, "region")
    return (
        with_metadata_columns(r)
        .groupBy("meta_file_name")
        .agg(F.count("*").alias("n"))
    )
