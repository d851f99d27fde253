"""Scalar function conformance — strings (SURVEY.md §2.11,
BuiltInFunctionDefinitions.java:501-935). Each query computes a batch
of functions over fixture strings; DuckDB oracle pins exact semantics
(1-based positions, null propagation, padding, regex dialect)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.functions.scalar import split_index
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "func_string_basic",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                         AS up,
           lower(c_mktsegment)                   AS lo,
           length(c_name)                        AS char_len,
           substring(c_name, 1, 8)               AS sub8,
           substring(c_name, 4)                  AS sub_from4,
           c_name || '#' || c_mktsegment         AS concat2,
           concat_ws('-', c_name, c_mktsegment)  AS cws,
           trim('  ' || c_name || ' ')           AS trimmed,
           ltrim('xx' || c_name, 'x')            AS ltrimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           reverse(c_mktsegment)                 AS rev,
           left(c_name, 4)                       AS l4,
           right(c_name, 3)                      AS r3,
           repeat(c_mktsegment, 2)               AS rep2,
           replace(c_name, 'Customer', 'Cust')   AS repl
    FROM customer
    """,
    tags=("functions", "string"),
)
def func_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """charLength/initCap-adjacent basics: lower/upper, trim, concat/concat_ws, substring, replace, repeat, reverse, ascii/chr (BuiltInFunctionDefinitions.java:501-935)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").alias("char_len"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.expr("substring(c_name, 4)").alias("sub_from4"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("concat2"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("cws"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.expr("trim(LEADING 'x' FROM concat('xx', c_name))").alias("ltrimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.expr("left(c_name, 4)").alias("l4"),
        F.expr("right(c_name, 3)").alias("r3"),
        F.repeat("c_mktsegment", 2).alias("rep2"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
    )


@query(
    "func_string_search",
    oracle="""
    SELECT p_partkey,
           instr(p_name, 'o')                    AS pos_o,
           position('d' IN p_name)               AS pos_d,
           CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END  AS like_widget,
           CASE WHEN regexp_matches(p_name, '^[a-z]+ ') THEN 1 ELSE 0 END AS starts_word,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, ' ', '_', 'g')  AS underscored,
           str_split(p_name, ' ')[2]              AS second_tok,
           str_split(p_name, ' ')[1]              AS first_tok,
           str_split(p_name, ' ')[9]              AS oob_tok,
           CASE WHEN starts_with(p_name, 'large') THEN 1 ELSE 0 END AS sw,
           CASE WHEN ends_with(p_brand, '5') THEN 1 ELSE 0 END AS ew
    FROM part
    """,
    tags=("functions", "string"),
)
def func_string_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE/SIMILAR/regexp/position family (instr, locate, regexpExtract
    :711, regexpReplace, splitIndex :923 — incl. out-of-range index →
    NULL, Flink SPLIT_INDEX semantics)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.instr("p_name", "o").alias("pos_o"),
        F.locate("d", F.col("p_name")).alias("pos_d"),
        F.col("p_name").like("%widget%").cast("int").alias("like_widget"),
        F.col("p_name").rlike("^[a-z]+ ").cast("int").alias("starts_word"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", " ", "_").alias("underscored"),
        split_index("p_name", " ", 1).alias("second_tok"),
        split_index("p_name", " ", 0).alias("first_tok"),
        split_index("p_name", " ", 8).alias("oob_tok"),
        F.startswith(F.col("p_name"), F.lit("large")).cast("int").alias("sw"),
        F.endswith(F.col("p_brand"), F.lit("5")).cast("int").alias("ew"),
    )


@query(
    "func_string_codec",
    oracle="""
    SELECT n_nationkey,
           md5(n_name)                                   AS h_md5,
           sha256(n_name)                                AS h_sha256,
           to_base64(encode(n_name))                     AS b64,
           decode(from_base64(to_base64(encode(n_name)))) AS b64_roundtrip,
           unicode(n_name)                               AS first_cp,
           chr(unicode(n_name))                          AS first_ch,
           to_hex(n_nationkey)                           AS hexed,
           bin(CAST(n_nationkey AS BIGINT))              AS binned
    FROM nation
    """,
    tags=("functions", "string", "hash"),
)
def func_string_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/codec family (BuiltInFunctionDefinitions.java:1641-1689 md5/
    sha2; :677 fromBase64/toBase64; :643 ascii/chr; :1392-1400 bin/hex)."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5("n_name").alias("h_md5"),
        F.sha2("n_name", 256).alias("h_sha256"),
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("n_name").cast("binary"))).cast("string").alias("b64_roundtrip"),
        F.ascii("n_name").alias("first_cp"),
        F.chr(F.ascii("n_name")).alias("first_ch"),
        F.hex(F.col("n_nationkey")).alias("hexed"),
        F.bin(F.col("n_nationkey").cast("bigint")).alias("binned"),
    )


@query(
    "func_string_initcap_overlay",
    oracle="""
    SELECT n_nationkey,
           array_to_string(
             list_transform(str_split(lower(n_name), ' '),
                            w -> upper(w[1:1]) || w[2:]), ' ') AS initcapped,
           substring(n_name, 1, 2) || 'XX' || substring(n_name, 5) AS overlaid,
           translate(n_name, 'AEIOU', 'aeiou') AS translated
    FROM nation
    """,
    tags=("functions", "string"),
)
def func_string_initcap_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """initCap (:522), overlay (:599), translate — DuckDB lacks
    initcap/overlay so the oracle spells out the semantics."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.initcap(F.lower("n_name")).alias("initcapped"),
        F.overlay("n_name", F.lit("XX"), 3, 2).alias("overlaid"),
        F.translate("n_name", "AEIOU", "aeiou").alias("translated"),
    )


def _sha_oracle() -> str:
    """Expected digests precomputed with hashlib over the FIXED literal
    inputs — DuckDB 1.x ships only sha256, so the sha1/224/384/512
    conformance rows compare against known-answer constants (exactly
    how the reference's function ITCases pin expected strings)."""
    import hashlib

    rows = []
    for s in ("flink", "spark"):
        b = s.encode()
        rows.append(
            "SELECT '{}' AS s, '{}' AS sha1_hex, '{}' AS sha224_hex, "
            "'{}' AS sha256_hex, '{}' AS sha384_hex, '{}' AS sha512_hex, "
            "'{}' AS json_str, '{}' AS json_int, 'true' AS json_bool".format(
                s,
                hashlib.sha1(b).hexdigest(),
                hashlib.sha224(b).hexdigest(),
                hashlib.sha256(b).hexdigest(),
                hashlib.sha384(b).hexdigest(),
                hashlib.sha512(b).hexdigest(),
                '"' + s + '"',
                len(s),
            )
        )
    return " UNION ALL ".join(rows)


@query(
    "func_sha_json_string",
    oracle=_sha_oracle(),
    tags=("function", "string", "json"),
)
def func_sha_json_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHA1/SHA2-224/256/384/512 (BuiltInFunctionDefinitions sha1/
    sha224/sha256/sha384/sha512) and JSON_STRING (scalar-to-JSON
    serialization) over fixed literal inputs — known-answer conformance,
    the reference function-ITCase style. JSON_STRING maps onto
    to_json(named_struct(...)) with the wrapper stripped."""
    rows = spark.createDataFrame([("flink",), ("spark",)], "s string")

    def json_string(c):
        j = F.to_json(F.struct(c.alias("v")))
        return F.regexp_replace(
            F.regexp_replace(j, r'^\{"v":', ""), r"\}$", ""
        )

    return rows.select(
        "s",
        F.sha1("s").alias("sha1_hex"),
        F.sha2("s", 224).alias("sha224_hex"),
        F.sha2("s", 256).alias("sha256_hex"),
        F.sha2("s", 384).alias("sha384_hex"),
        F.sha2("s", 512).alias("sha512_hex"),
        json_string(F.col("s")).alias("json_str"),
        json_string(F.length("s")).alias("json_int"),
        json_string(F.lit(True)).alias("json_bool"),
    )
