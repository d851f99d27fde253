"""Scalar function library part 2 (SURVEY.md §2.11 tail).

Reference functions covered here (BuiltInFunctionDefinitions.java):
parseUrl (:830), strToMap (:935), splitIndex (:923), lpad/rpad,
ltrim/rtrim, left/right, position, timestampDiff/timestampAdd,
fromUnixtime (:1378), truncate, cot, e/pi. DuckDB 1.0 has no
parse_url/str_to_map — their oracles rebuild the same values from
regexp/string primitives, which also pins down OUR semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "func_parse_url",
    oracle="""
    WITH urls AS (
      SELECT n_nationkey,
             'https://ex' || n_nationkey || '.org/p/' || n_name || '?rk=' || n_regionkey AS url
      FROM nation
    )
    SELECT n_nationkey,
           regexp_extract(url, '^([a-z]+)://', 1)              AS proto,
           regexp_extract(url, '://([^/?#]+)', 1)               AS host,
           regexp_extract(url, '://[^/?#]+(/[^?#]*)', 1)        AS path,
           regexp_extract(url, '\\?rk=(\\d+)', 1)               AS rk
    FROM urls
    """,
    tags=("functions", "string"),
)
def func_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARSE_URL(url, part) — Spark parse_url; oracle re-derives the
    same parts with regexes (DuckDB has no parse_url)."""
    n = load(spark, sf_dir, "nation")
    url = F.concat(
        F.lit("https://ex"),
        F.col("n_nationkey").cast("string"),
        F.lit(".org/p/"),
        F.col("n_name"),
        F.lit("?rk="),
        F.col("n_regionkey").cast("string"),
    )
    u = n.select("n_nationkey", url.alias("url"))
    return u.select(
        "n_nationkey",
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("rk")).alias("rk"),
    )


@query(
    "func_str_to_map",
    oracle="""
    SELECT n_nationkey,
           'k=' || n_name || ',r=' || n_regionkey AS raw,
           n_name       AS k_val,
           n_regionkey::VARCHAR AS r_val
    FROM nation
    """,
    tags=("functions", "string", "collections"),
)
def func_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR_TO_MAP + element access (map values projected out so the
    oracle compares scalars, not map types)."""
    n = load(spark, sf_dir, "nation")
    raw = F.concat(
        F.lit("k="), F.col("n_name"), F.lit(",r="), F.col("n_regionkey").cast("string")
    )
    m = F.str_to_map(raw, F.lit(","), F.lit("="))
    return n.select(
        "n_nationkey",
        raw.alias("raw"),
        m.getItem("k").alias("k_val"),
        m.getItem("r").alias("r_val"),
    )


@query(
    "func_split_index_pad",
    oracle="""
    SELECT doc_id,
           str_split(text, ' ')[1]                           AS first_word,
           str_split(text, ' ')[2]                           AS second_word,
           lpad(lang, 8, '*')                                AS padded_l,
           rpad(lang, 8, '.')                                AS padded_r,
           ltrim(rtrim('  ' || lang || '  '))                AS trimmed,
           left(text, 3)                                     AS l3,
           right(text, 3)                                    AS r3,
           position('e' IN text)                             AS pos_e
    FROM documents
    """,
    tags=("functions", "string"),
)
def func_split_index_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT_INDEX (split + element_at), LPAD/RPAD, LTRIM/RTRIM,
    LEFT/RIGHT, POSITION."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, 2).alias("second_word"),
        F.lpad("lang", 8, "*").alias("padded_l"),
        F.rpad("lang", 8, ".").alias("padded_r"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), F.col("lang"), F.lit("  ")))).alias("trimmed"),
        F.substring("text", 1, 3).alias("l3"),
        F.col("text").substr(F.length("text") - 2, F.lit(3)).alias("r3"),
        F.locate("e", F.col("text")).alias("pos_e"),
    )


@query(
    "func_timestamp_arith",
    oracle="""
    SELECT event_id,
           date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) AS mins_since_epoch0,
           ts + INTERVAL 90 MINUTE                                  AS plus_90m,
           ts - INTERVAL 1 DAY                                      AS minus_1d,
           floor(epoch(ts))::BIGINT                                        AS unix_secs,
           to_timestamp(floor(epoch(ts))::BIGINT)::TIMESTAMP               AS roundtrip
    FROM events
    """,
    tags=("functions", "temporal"),
)
def func_timestamp_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMPDIFF/TIMESTAMPADD/FROM_UNIXTIME family."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.timestamp_diff("MINUTE", F.lit("2024-01-01 00:00:00").cast("timestamp"), F.col("ts"))
        .alias("mins_since_epoch0"),
        F.timestamp_add("MINUTE", F.lit(90), F.col("ts")).alias("plus_90m"),
        (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("minus_1d"),
        F.unix_timestamp("ts").alias("unix_secs"),
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("roundtrip"),
    )


@query(
    "func_math_misc",
    oracle="""
    SELECT event_id,
           round(1.0 / tan(value), 6)                 AS cot_v,
           round(exp(1.0), 6)                         AS e_const,
           round(pi(), 6)                             AS pi_const,
           floor(value * 100) / 100                   AS trunc2,
           CAST(mod(floor(value)::BIGINT, 7) AS BIGINT)      AS mod7
    FROM events WHERE value > 0.1
    """,
    tags=("functions", "math"),
)
def func_math_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COT (1/tan), E, PI, TRUNCATE(x,2) (floor arithmetic — identical
    on both engines for positive values), MOD."""
    ev = load(spark, sf_dir, "events").where(F.col("value") > 0.1)
    return ev.select(
        "event_id",
        F.round(1.0 / F.tan("value"), 6).alias("cot_v"),
        F.round(F.exp(F.lit(1.0)), 6).alias("e_const"),
        F.round(F.lit(3.14159265358979), 6).alias("pi_const"),
        (F.floor(F.col("value") * 100) / 100).alias("trunc2"),
        (F.floor("value").cast("bigint") % 7).alias("mod7"),
    )


@query(
    "func_math_hyperbolic_conv",
    oracle="""
    SELECT n_nationkey,
           round((exp(n_nationkey/10.0) - exp(-n_nationkey/10.0)) / 2, 6) AS h_sinh,
           round((exp(n_nationkey/10.0) + exp(-n_nationkey/10.0)) / 2, 6) AS h_cosh,
           round((exp(2*n_nationkey/10.0) - 1) / (exp(2*n_nationkey/10.0) + 1), 6) AS h_tanh,
           upper(to_hex(n_nationkey + 200)) AS hex_conv,
           round(exp(1), 6) AS euler,
           'int' AS typeof_key,
           TRUE AS uuid_shape_ok
    FROM nation
    """,
    tags=("functions", "math"),
)
def func_math_hyperbolic_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SINH/COSH/TANH (BuiltInFunctionDefinitions math tail), CONV
    base-10→16 (FlinkSqlOperatorTable BIN/HEX family), E(), TYPEOF,
    UUID (:uuid — nondeterministic, so the oracle pins its *shape*:
    36 chars, 8-4-4-4-12 hex groups). DuckDB 1.x has no hyperbolics —
    the oracle rebuilds them from exp(), which also pins our exact
    definition."""
    n = load(spark, sf_dir, "nation")
    x = F.col("n_nationkey") / 10.0
    return n.select(
        "n_nationkey",
        F.round(F.sinh(x), 6).alias("h_sinh"),
        F.round(F.cosh(x), 6).alias("h_cosh"),
        F.round(F.tanh(x), 6).alias("h_tanh"),
        F.conv((F.col("n_nationkey") + 200).cast("string"), 10, 16).alias("hex_conv"),
        F.round(F.expr("e()"), 6).alias("euler"),
        F.expr("typeof(n_nationkey)").alias("typeof_key"),
        F.expr(
            "uuid() rlike '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$'"
        ).alias("uuid_shape_ok"),
    )


@query(
    "func_tz_json_path",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 8 HOUR AS sh_time,
           ts - INTERVAL 5 HOUR AS ny_winter_time,
           CAST(props::JSON ->> 'k' AS BIGINT) AS k_val,
           props::JSON ->> 'k' IS NOT NULL AS k_exists,
           CAST(NULL AS VARCHAR) AS missing_path
    FROM events
    WHERE event_id < 500
    """,
    tags=("functions", "temporal", "json"),
)
def func_tz_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT_TZ / timezone shifting (FlinkSqlOperatorTable
    CONVERT_TZ; toTimestampLtz :1520) via from_utc_timestamp against
    fixed-offset zones (Asia/Shanghai +8 year-round; Etc/GMT+5 = UTC-5
    — DST-free so the interval oracle is exact), plus SQL/JSON
    JSON_VALUE / JSON_EXISTS / JSON_QUERY over the events.props JSON
    column (reference SqlJsonUtils.java:63)."""
    ev = load(spark, sf_dir, "events").where("event_id < 500")
    return ev.select(
        "event_id",
        F.from_utc_timestamp("ts", "Asia/Shanghai").alias("sh_time"),
        F.from_utc_timestamp("ts", "Etc/GMT+5").alias("ny_winter_time"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.k").isNotNull().alias("k_exists"),
        F.get_json_object("props", "$.nope.deep").alias("missing_path"),
    )


@query(
    "func_decimal_precision",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS dec_sum,
           CAST(CAST(avg(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,8)) AS VARCHAR) AS dec_avg,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - l_discount AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS VARCHAR) AS dec_revenue,
           CAST(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,10))
                / count(*) AS DECIMAL(38,6)) AS VARCHAR) AS dec_div
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("functions", "decimal"),
)
def func_decimal_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL(38) arithmetic parity (reference DecimalITCase /
    DecimalData.java, SURVEY.md §1.3): high-precision SUM/AVG, scaled
    multiplication, and division with explicit result casts so both
    engines land on identical (precision, scale) — the places decimal
    engines actually diverge (HALF_UP vs truncation, scale promotion)
    are pinned by the casts."""
    l = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,6)")
    return l.groupBy("l_returnflag").agg(
        F.sum(price).cast("decimal(38,2)").cast("string").alias("dec_sum"),
        F.avg(qty).cast("decimal(38,8)").cast("string").alias("dec_avg"),
        F.sum(price * disc).cast("decimal(38,4)").cast("string").alias("dec_revenue"),
        (F.sum(price).cast("decimal(38,10)") / F.count("*"))
        .cast("decimal(38,6)")
        .cast("string")
        .alias("dec_div"),
    )


@query(
    "func_extract_fields",
    oracle="""
    SELECT event_id,
           year(ts)  AS y, quarter(ts) AS q, month(ts) AS mo,
           weekofyear(ts) AS iso_week,
           dayofweek(ts) + 1 AS dow_sun1,
           isodow(ts) AS iso_dow,
           dayofyear(ts) AS doy,
           hour(ts) AS h, minute(ts) AS mi,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           last_day(ts)::DATE::VARCHAR AS month_end
    FROM events WHERE event_id < 2000
    """,
    tags=("functions", "temporal"),
)
def func_extract_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT field parity (BuiltInFunctionDefinitions.java:1439
    extract): YEAR/QUARTER/MONTH/ISO week/day-of-week (Spark numbers
    Sunday=1, DuckDB Sunday=0 — oracle normalizes +1), ISO dow,
    DOY/HOUR/MINUTE/EPOCH, LAST_DAY. These numberings are exactly
    where engines diverge; the oracle pins ours."""
    ev = load(spark, sf_dir, "events").where("event_id < 2000")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.quarter("ts").alias("q"),
        F.month("ts").alias("mo"),
        F.weekofyear("ts").alias("iso_week"),
        F.dayofweek("ts").alias("dow_sun1"),
        F.expr("extract(DAYOFWEEK_ISO FROM ts)").alias("iso_dow"),
        F.dayofyear("ts").alias("doy"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.last_day("ts").cast("string").alias("month_end"),
    )


@query(
    "func_bit_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 7 AS bor,
           xor(o_orderkey, 255) AS bxor,
           ~o_orderkey AS bnot,
           o_orderkey << 2 AS shl,
           o_orderkey >> 2 AS shr
    FROM orders WHERE o_orderkey < 400
    """,
    tags=("functions", "math"),
)
def func_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function parity (BuiltInFunctionDefinitions BITAND/BITOR/
    BITXOR/BITNOT; Flink planner ScalarOperatorGens bit ops): &, |,
    xor, ~, shifts — all JVM-codegen'd integer expressions."""
    o = load(spark, sf_dir, "orders").where("o_orderkey < 400")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("band"),
        F.expr("o_orderkey | 7").alias("bor"),
        F.expr("o_orderkey ^ 255").alias("bxor"),
        F.expr("~o_orderkey").alias("bnot"),
        F.expr("o_orderkey << 2").alias("shl"),
        F.expr("o_orderkey >> 2").alias("shr"),
    )


@query(
    "func_flink_string_predicates",
    oracle=r"""
    SELECT p_partkey,
           regexp_matches(replace(p_brand, '#', ''), '^[A-Za-z0-9]+$')
             AND NOT regexp_matches(replace(p_brand, '#', ''), '[0-9]') AS alpha_brand,
           regexp_matches(split_part(p_brand, '#', 2), '^[0-9]+$') AS digit_suffix,
           regexp_matches(CAST(p_retailprice AS VARCHAR), '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$') AS dec_price,
           regexp_matches(p_name, '^\p{L}+$') AS alpha_name
    FROM part WHERE p_partkey < 300
    """,
    tags=("functions", "string"),
)
def func_flink_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink-only string predicates IS_ALPHA / IS_DIGIT / IS_DECIMAL
    (flink-table-runtime SqlFunctionUtils.isAlpha/isDigit/isDecimal) —
    no Spark builtin, implemented as codegen'd rlike in
    functions/scalar.py. p_name contains spaces → alpha_name false;
    split digits of p_brand → digit_suffix true; price renders as a
    plain decimal string → dec_price true."""
    from flink_1_16_0_src_spark.functions.scalar import is_alpha, is_decimal, is_digit

    p = load(spark, sf_dir, "part").where("p_partkey < 300")
    return p.select(
        "p_partkey",
        is_alpha(F.replace(F.col("p_brand"), F.lit("#"), F.lit(""))).alias("alpha_brand"),
        is_digit(F.split_part("p_brand", F.lit("#"), F.lit(2))).alias("digit_suffix"),
        is_decimal(F.col("p_retailprice").cast("string")).alias("dec_price"),
        is_alpha("p_name").alias("alpha_name"),
    )


@query(
    "func_from_unixtime",
    oracle="""
    SELECT event_id,
           strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS dt_str,
           strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y-%m-%d') AS d_str
    FROM events WHERE event_id < 1500
    """,
    tags=("functions", "temporal"),
)
def func_from_unixtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM_UNIXTIME parity (BuiltInFunctionDefinitions.java:1378
    fromUnixtime, default + custom format). Session TZ is UTC on both
    engines, so the rendered strings agree exactly."""
    ev = load(spark, sf_dir, "events").where("event_id < 1500")
    epoch = F.unix_timestamp("ts")
    return ev.select(
        "event_id",
        F.from_unixtime(epoch).alias("dt_str"),
        F.from_unixtime(epoch, "yyyy-MM-dd").alias("d_str"),
    )


@query(
    "func_array_extras",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_sort(list_distinct(
             list_concat(str_split(p_name, ' '), str_split(p_type, ' ')))), ',') AS uni,
           array_to_string(list_sort(list_filter(list_distinct(str_split(p_name, ' ')),
             x -> NOT list_contains(str_split(p_type, ' '), x))), ',') AS exc,
           array_to_string(list_filter(str_split(p_name, ' '), x -> x <> 'red'), ',') AS removed,
           coalesce(list_position(str_split(p_name, ' '), 'red'), 0) AS pos_red,
           array_to_string(list_transform(generate_series(1, 2), i -> p_brand), ',') AS rep,
           array_to_string(list_sort(str_split(p_name, ' '), 'DESC'), ',') AS sorted_desc,
           array_to_string(list_concat(str_split(p_name, ' '), str_split(p_type, ' ')), ',') AS flat
    FROM part WHERE p_partkey < 300
    """,
    tags=("functions", "collections"),
)
def func_array_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family beyond the basics (BuiltInFunctionDefinitions
    ARRAY_UNION/ARRAY_EXCEPT/ARRAY_REMOVE/ARRAY_POSITION/ARRAY_REPEAT/
    ARRAY_SORT/ARRAY_CONCAT — Flink 1.16+ collection functions): union
    and except compared as SORTED joined strings (Spark preserves
    first-occurrence order, DuckDB's list_distinct does not — the
    driver-comparable canonical form is order-free), the rest
    order-exact."""
    p = load(spark, sf_dir, "part").where("p_partkey < 300")
    name, typ = F.split("p_name", " "), F.split("p_type", " ")
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(F.array_union(name, typ)), ",").alias("uni"),
        F.array_join(F.array_sort(F.array_except(name, typ)), ",").alias("exc"),
        F.array_join(F.array_remove(name, "red"), ",").alias("removed"),
        F.array_position(name, "red").alias("pos_red"),
        F.array_join(F.array_repeat(F.col("p_brand"), 2), ",").alias("rep"),
        F.array_join(F.sort_array(name, False), ",").alias("sorted_desc"),
        F.array_join(F.concat(name, typ), ",").alias("flat"),
    )


@query(
    "func_map_extras",
    oracle="""
    WITH m AS (
      SELECT p_partkey,
             map(['brand', 'ptype'], [p_brand, p_type]) AS m1,
             map(['size'], [CAST(p_size AS VARCHAR)]) AS m2
      FROM part WHERE p_partkey < 300
    )
    SELECT p_partkey,
           array_to_string(list_sort(map_keys(m1)), ',') AS ks,
           array_to_string(list_sort(map_values(m1)), ',') AS vs,
           CAST(cardinality(m1) AS INT) AS n1,
           m1['brand'][1] AS brand_val,
           array_to_string(list_sort(map_keys(map_concat(m1, m2))), ',') AS all_keys,
           list_contains(map_keys(m1), 'brand') AS has_brand
    FROM m
    """,
    tags=("functions", "collections"),
)
def func_map_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family (BuiltInFunctionDefinitions MAP_KEYS/
    MAP_VALUES/CARDINALITY/element access/MAP_UNION — Flink collection
    functions over MAP<K,V>): maps built from literal key arrays,
    compared via sorted key/value join strings + point lookups."""
    p = load(spark, sf_dir, "part").where("p_partkey < 300")
    m1 = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("ptype")),
        F.array(F.col("p_brand"), F.col("p_type")),
    )
    m2 = F.map_from_arrays(
        F.array(F.lit("size")), F.array(F.col("p_size").cast("string"))
    )
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(F.map_keys(m1)), ",").alias("ks"),
        F.array_join(F.array_sort(F.map_values(m1)), ",").alias("vs"),
        F.size(m1).alias("n1"),
        F.element_at(m1, "brand").alias("brand_val"),
        F.array_join(F.array_sort(F.map_keys(F.map_concat(m1, m2))), ",").alias("all_keys"),
        F.array_contains(F.map_keys(m1), "brand").alias("has_brand"),
    )


_SIMILAR_PATTERNS = {
    "color_name": ("p_name", "%(red|blue|green)%"),
    "single_digit_brand": ("p_brand", "Brand#_"),
    "small_medium_type": ("p_type", "(SMALL|MEDIUM)%"),
}


@query(
    "func_similar_to",
    oracle="""
    SELECT p_partkey,
           regexp_matches(p_name, '^.*(red|blue|green).*$') AS color_name,
           regexp_matches(p_brand, '^Brand#.$') AS single_digit_brand,
           regexp_matches(p_type, '^(SMALL|MEDIUM).*$') AS small_medium_type
    FROM part WHERE p_partkey < 400
    """,
    tags=("functions", "string"),
)
def func_similar_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 SIMILAR TO conformance (Calcite SqlLikeUtils.similar —
    the reference planner's predicate): LIKE wildcards + regex
    alternation/classes over part strings. Spark has no SIMILAR TO;
    functions/scalar.similar_to translates the pattern to one anchored
    codegen'd RLike. The oracle consumes the SAME translated regex —
    DuckDB's native SIMILAR TO is plain anchored regex WITHOUT %/_
    translation (cross-dialect trap), so both engines share the
    similar_to_regex output."""
    from flink_1_16_0_src_spark.functions.scalar import similar_to

    p = load(spark, sf_dir, "part").where("p_partkey < 400")
    return p.select(
        "p_partkey",
        *[
            similar_to(col, pat).alias(name)
            for name, (col, pat) in _SIMILAR_PATTERNS.items()
        ],
    )


@query(
    "func_distinct_from_element",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderkey % 3, 0) IS DISTINCT FROM nullif(o_orderkey % 5, 0)
             AS is_distinct,
           nullif(o_orderkey % 3, 0) IS NOT DISTINCT FROM nullif(o_orderkey % 5, 0)
             AS not_distinct,
           ([o_orderpriority])[1] AS elem_priority,
           regexp_matches(o_orderpriority, '^[12]-.*$') AS urgent_or_high
    FROM orders WHERE o_orderkey < 500
    """,
    tags=("functions", "comparison"),
)
def func_distinct_from_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] DISTINCT FROM (null-safe comparison — Spark's <=>
    operator is exactly IS NOT DISTINCT FROM) + Flink ELEMENT(array)
    (sole element of a 1-element array, NULL on empty, error on >1 —
    BuiltInFunctionDefinitions ELEMENT) + one more SIMILAR TO shape
    over orders. NULLs injected via nullif so every null/null,
    null/value, value/value branch of the null-safe comparison is
    exercised."""
    from flink_1_16_0_src_spark.functions.scalar import element, similar_to

    o = load(spark, sf_dir, "orders").where("o_orderkey < 500")
    a = F.nullif(F.col("o_orderkey") % 3, F.lit(0))
    b = F.nullif(F.col("o_orderkey") % 5, F.lit(0))
    return o.select(
        "o_orderkey",
        (~a.eqNullSafe(b)).alias("is_distinct"),
        a.eqNullSafe(b).alias("not_distinct"),
        element(F.array("o_orderpriority")).alias("elem_priority"),
        similar_to("o_orderpriority", "[12]-%").alias("urgent_or_high"),
    )


@query(
    "func_group_id",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, 0 AS group_id
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, 1 AS group_id
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("functions", "aggregates"),
)
def func_group_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_ID() conformance (Calcite, surfaced by the reference's
    planner): with DUPLICATE grouping sets — GROUP BY GROUPING SETS
    ((o_orderpriority), (o_orderpriority)) — each group row is emitted
    once per duplicate with GROUP_ID() = 0..n-1. Spark rejects
    duplicate grouping sets, so the query runs Calcite's OWN expansion
    of the construct: the aggregate is computed once and unioned with
    per-duplicate literal ids (the second branch reuses the same
    Exchange via Spark's ReuseExchange rule rather than rescanning)."""
    o = load(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(F.count("*").cast("bigint").alias("n"))
    return agg.withColumn("group_id", F.lit(0)).unionAll(
        agg.withColumn("group_id", F.lit(1))
    )


@query(
    "func_bool_predicates",
    oracle="""
    SELECT n_nationkey,
           (f IS TRUE)::int        AS is_t,
           (f IS NOT TRUE)::int    AS is_nt,
           (f IS FALSE)::int       AS is_f,
           (f IS NOT FALSE)::int   AS is_nf,
           (n_nationkey NOT BETWEEN 5 AND 20)::int AS nb
    FROM (SELECT n_nationkey,
                 CASE WHEN n_nationkey % 3 = 0 THEN NULL
                      ELSE n_nationkey % 2 = 0 END AS f
          FROM nation) t
    """,
    tags=("functions", "conditional"),
)
def func_bool_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued boolean tests IS [NOT] TRUE/FALSE (FlinkSqlOperatorTable
    IS_TRUE/IS_NOT_TRUE/IS_FALSE/IS_NOT_FALSE) and NOT BETWEEN —
    NULL IS NOT TRUE = true, the SQL boolean-test (not negation)
    semantics. Cast to int so the hash pins the 3VL collapse."""
    n = load(spark, sf_dir, "nation")
    n.createOrReplaceTempView("func_bool_nation")
    return spark.sql("""
        SELECT n_nationkey,
               CAST(f IS TRUE AS int)      AS is_t,
               CAST(f IS NOT TRUE AS int)  AS is_nt,
               CAST(f IS FALSE AS int)     AS is_f,
               CAST(f IS NOT FALSE AS int) AS is_nf,
               CAST(n_nationkey NOT BETWEEN 5 AND 20 AS int) AS nb
        FROM (SELECT n_nationkey,
                     CASE WHEN n_nationkey % 3 = 0 THEN NULL
                          ELSE n_nationkey % 2 = 0 END AS f
              FROM func_bool_nation) t
    """)


@query(
    "func_to_timestamp_ltz",
    oracle="""
    SELECT n_nationkey,
           (to_timestamp(1700000000 + n_nationkey * 86400)
              AT TIME ZONE 'UTC')::timestamp AS ts_s,
           (epoch_ms(1700000000123 + n_nationkey * 3600000)
              AT TIME ZONE 'UTC' AT TIME ZONE 'UTC')::timestamp AS ts_ms
    FROM nation
    """,
    tags=("functions", "temporal"),
)
def func_to_timestamp_ltz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TO_TIMESTAMP_LTZ(numeric, precision) with precision 0 (seconds)
    and 3 (millis) — BuiltInFunctionDefinitions TO_TIMESTAMP_LTZ →
    timestamp_seconds/timestamp_millis (the session is UTC, so the
    LTZ instant and the wall reading agree; oracle converts the same
    epochs via to_timestamp/epoch_ms)."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.timestamp_seconds(F.lit(1700000000) + F.col("n_nationkey") * 86400).alias("ts_s"),
        F.timestamp_millis(
            F.lit(1700000000123) + F.col("n_nationkey") * 3600000
        ).alias("ts_ms"),
    )


# Java String.hashCode() known answers, computed by the JLS formula
# s[0]*31^(n-1) + ... + s[n-1] with 32-bit wrap — the exact values
# HASH_CODE (FlinkSqlOperatorTable.java HASH_CODE, ScalarOperatorGens
# hashCode codegen) returns. The long input overflows int32 on purpose.
_HASH_CODE_KAT = [
    ("click", 94750088),
    ("purchase", 1743324417),
    ("ALGERIA", -198280703),
    ("the quick brown fox jumps over the lazy dog", -2082818701),
]


@query(
    "func_hash_code",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(f"('{s}', {h})" for s, h in _HASH_CODE_KAT)
    + ") AS t(s, h)",
    tags=("functions", "string"),
)
def func_hash_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH_CODE(string) — Java String.hashCode parity, evaluated
    JVM-side as one codegen'd aggregate() fold over the code points
    with explicit 32-bit wraparound (bigint accumulator, mod 2^32,
    sign-adjust) so ANSI overflow checking never trips. Oracle =
    known-answer table from the JLS formula."""
    rows = spark.createDataFrame([(s,) for s, _ in _HASH_CODE_KAT], "s string")
    return rows.select(
        "s",
        F.expr(
            "cast(((aggregate(split(s, ''), cast(0 as bigint),"
            " (acc, c) -> (acc * 31 + ascii(c)) % 4294967296)"
            " + 2147483648) % 4294967296) - 2147483648 as int)"
        ).alias("h"),
    )
