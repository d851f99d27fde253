"""Scalar function conformance — JSON, conditional, cast, collections
(SURVEY.md §2.11: JSON :1825-1951, comparison/logic :194-366, casts
:1971-1988, collections :1560-1640)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "func_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                 AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.missing')           AS missing,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END     AS is_json,
           json_extract_string('{"a":{"b":"deep"}}', '$.a.b') AS deep
    FROM events
    """,
    tags=("functions", "json"),
)
def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_VALUE / IS_JSON / nested path (reference SqlJsonUtils.java:63;
    JSON path subset where Spark's get_json_object and SQL/JSON agree)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing"),
        F.when(F.try_parse_json(F.col("props")).isNotNull(), 1).otherwise(0).alias("is_json"),
        F.get_json_object(F.lit('{"a":{"b":"deep"}}'), "$.a.b").alias("deep"),
    )


@query(
    "func_json_construct",
    oracle="""
    SELECT n_nationkey,
           to_json(struct_pack(name := n_name, region := n_regionkey)) AS obj,
           to_json([n_nationkey, n_regionkey])                         AS arr
    FROM nation
    """,
    tags=("functions", "json"),
)
def func_json_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_OBJECT / JSON_ARRAY (JsonObjectAggFunction analog at row
    level) via to_json(struct/array)."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(
            F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
        ).alias("obj"),
        F.to_json(F.array(F.col("n_nationkey"), F.col("n_regionkey"))).alias("arr"),
    )


@query(
    "func_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                          AS bucket,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS is_null_bal,
           greatest(c_acctbal, 1000.0)                   AS at_least_1k,
           least(c_acctbal, 9000.0)                      AS at_most_9k,
           coalesce(NULL, c_mktsegment)                  AS ifnull_seg,
           CASE WHEN c_acctbal BETWEEN 0 AND 1000 THEN 1 ELSE 0 END AS in_band,
           CASE WHEN c_mktsegment IN ('AUTOMOBILE','MACHINERY') THEN 1 ELSE 0 END AS seg_in
    FROM customer
    """,
    tags=("functions", "conditional"),
)
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/GREATEST/LEAST/IFNULL/BETWEEN/IN
    (BuiltInFunctionDefinitions.java:122-366)."""
    c = load(spark, sf_dir, "customer")
    b = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(b < 0, "neg").when(b < 5000, "mid").otherwise("high").alias("bucket"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        b.isNull().cast("int").alias("is_null_bal"),
        F.greatest(b, F.lit(1000.0)).alias("at_least_1k"),
        F.least(b, F.lit(9000.0)).alias("at_most_9k"),
        F.coalesce(F.lit(None).cast("string"), F.col("c_mktsegment")).alias("ifnull_seg"),
        b.between(0, 1000).cast("int").alias("in_band"),
        F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY").cast("int").alias("seg_in"),
    )


@query(
    "func_cast_try",
    oracle="""
    SELECT p_partkey,
           CAST(p_size AS VARCHAR)                         AS size_str,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS dec_back,
           try_cast(p_brand AS INT)                        AS bad_int,
           try_cast(CAST(p_size AS VARCHAR) AS INT)        AS good_int,
           CAST(p_size AS DOUBLE)                          AS size_dbl,
           try_cast('2024-13-99' AS TIMESTAMP)             AS bad_ts,
           try_cast('2024-06-15 12:00:00' AS TIMESTAMP)    AS good_ts
    FROM part
    """,
    tags=("functions", "cast"),
)
def func_cast_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST / TRY_CAST (BuiltInFunctionDefinitions.java:1971-1988);
    TRY_CAST returns NULL on failure in both engines."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("string").alias("size_str"),
        F.col("p_retailprice").cast("decimal(12,2)").cast("string").alias("price_dec"),
        F.col("p_retailprice").cast("decimal(12,2)").cast("double").alias("dec_back"),
        F.expr("try_cast(p_brand AS INT)").alias("bad_int"),
        F.col("p_size").cast("string").cast("int").alias("good_int"),
        F.col("p_size").cast("double").alias("size_dbl"),
        F.expr("try_cast('2024-13-99' AS TIMESTAMP)").alias("bad_ts"),
        F.expr("try_cast('2024-06-15 12:00:00' AS TIMESTAMP)").alias("good_ts"),
    )


@query(
    "func_collections",
    oracle="""
    SELECT p_partkey,
           CAST(len(str_split(p_name, ' ')) AS BIGINT)        AS n_words,
           list_contains(str_split(p_name, ' '), 'widget')   AS has_brushed,
           str_split(p_name, ' ')[2]                          AS second_el,
           array_to_string(list_sort(str_split(p_name, ' ')), ',') AS sorted_words,
           array_to_string(list_sort(list_distinct([p_size, p_size, p_size + 1])), ',') AS distinct_sizes,
           array_to_string(str_split(p_name, ' '), '+')       AS joined,
           array_to_string(flatten([[p_size], [p_size + 1]]), ',') AS flat,
           array_to_string([p_size, p_size * 2], ',')         AS arr_ctor,
           array_to_string(str_split(p_name, ' ')[1:2], ',')  AS sliced
    FROM part
    """,
    tags=("functions", "collections"),
)
def func_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY ctor/element_at/cardinality/contains/sort/distinct/flatten/
    slice (BuiltInFunctionDefinitions.java:1560-1640). Array-valued
    outputs are emitted as ','-joined strings so the driver's
    canonicalizer (which cannot sort/hash list cells) compares them;
    list_distinct in DuckDB doesn't preserve order → both sides sort
    before joining."""
    p = load(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.size(words).cast("bigint").alias("n_words"),
        F.array_contains(words, "widget").alias("has_brushed"),
        F.try_element_at(words, F.lit(2)).alias("second_el"),
        F.array_join(F.sort_array(words), ",").alias("sorted_words"),
        F.array_join(
            F.sort_array(
                F.array_distinct(F.array(F.col("p_size"), F.col("p_size"), F.col("p_size") + 1))
            ).cast("array<string>"),
            ",",
        ).alias("distinct_sizes"),
        F.array_join(words, "+").alias("joined"),
        F.array_join(
            F.flatten(F.array(F.array(F.col("p_size")), F.array(F.col("p_size") + 1))).cast(
                "array<string>"
            ),
            ",",
        ).alias("flat"),
        F.array_join(F.array(F.col("p_size"), F.col("p_size") * 2).cast("array<string>"), ",").alias(
            "arr_ctor"
        ),
        F.array_join(F.slice(words, 1, 2), ",").alias("sliced"),
    )
