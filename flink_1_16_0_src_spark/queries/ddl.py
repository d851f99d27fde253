"""DDL-surface queries: CREATE TABLE ... LIKE, EXECUTE STATEMENT SET,
ALTER TABLE — driver-checkable end-to-end through TableEnvironment.

Reference parity: SqlCreateTableLike.java:71 + SqlTableLike.java merge
options, SqlExecute.java + SqlStatementSet.java:41 (the SQL-text twin
of the StatementSet API), SqlAlterTableOptions.java /
SqlAlterTableAdd.java / SqlAlterTableModify.java. The semantics under
each query are plain scans/aggregates — the point is that the DDL TEXT
round-trips into the same results the oracle computes directly, the
way a Flink SQL user would drive the engine.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from flink_1_16_0_src_spark.registry import query

_seq = itertools.count()


def _tenv(spark: SparkSession):
    from flink_1_16_0_src_spark.session import TableEnvironment

    return TableEnvironment(spark)


@query(
    "ddl_create_table_like",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
           'derived' AS src_tag
    FROM events
    WHERE user_id % 7 = 0
    GROUP BY user_id
    """,
    tags=("ddl", "sql-surface"),
)
def ddl_create_table_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE ... LIKE (SqlCreateTableLike.java:71): the base
    registration carries schema + options + watermark; the derived
    table inherits all of it (default INCLUDING ALL OVERWRITING
    OPTIONS), appends a computed GENERATED column, and overrides one
    option — then the query reads THROUGH the derived table."""
    t = _tenv(spark)
    n = next(_seq)
    t.execute_sql(
        f"CREATE TABLE like_base_{n} (ts TIMESTAMP(3), user_id BIGINT, "
        f"event_type STRING, value DOUBLE, session_id STRING, "
        f"properties STRING, "
        f"WATERMARK FOR ts AS ts - INTERVAL '10' SECOND) "
        f"WITH ('connector'='filesystem',"
        f"'path'='{os.path.join(sf_dir, 'events.parquet')}',"
        f"'format'='parquet','tag'='base')"
    )
    t.execute_sql(
        f"CREATE TABLE like_derived_{n} (src_tag AS 'derived') "
        f"WITH ('tag'='override') LIKE like_base_{n}"
    )
    assert t._watermarks[f"like_derived_{n}"] == ("ts", "10 SECONDS")
    assert t._registrations[f"like_derived_{n}"]["props"]["tag"] == "override"
    return t.sql_query(
        f"""
        SELECT user_id,
               count(*) AS n,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS sum_cents,
               src_tag
        FROM like_derived_{n}
        WHERE user_id % 7 = 0
        GROUP BY user_id, src_tag
        """
    ).select("user_id", "n", "sum_cents", "src_tag")


@query(
    "ddl_ctas_jdbc",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("ddl", "ctas", "connector", "sql-surface"),
)
def ddl_ctas_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS into a JDBC table (r12, VERDICT r11 #7): CREATE TABLE ...
    WITH ('connector'='jdbc', ...) AS SELECT shares INSERT INTO's sink
    matrix (SqlCreateTableAs / FLIP-218 create-then-insert →
    JdbcDynamicTableSink.java). The aggregate lands in an embedded
    Derby database through Spark's jdbc writer, and the query result is
    the READ-BACK through the jdbc source — so the rows returned are
    the durable ones, not the plan's. Integer cents keep the value
    hash summation-order-proof."""
    from flink_1_16_0_src_spark.tables import load

    t = _tenv(spark)
    n = next(_seq)
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"ctas_orders_{n}")
    d = tempfile.mkdtemp(prefix="spark_graft_ctas_jdbc_")
    t.execute_sql(
        f"""
        CREATE TABLE ctas_jdbc_out_{n} WITH (
          'connector' = 'jdbc',
          'url' = 'jdbc:derby:{d}/db;create=true',
          'table-name' = 'ctas_out',
          'driver' = 'org.apache.derby.jdbc.EmbeddedDriver'
        ) AS SELECT o_orderpriority,
                    count(*) AS n,
                    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS total_cents
             FROM ctas_orders_{n} GROUP BY o_orderpriority
        """
    )
    return spark.table(f"ctas_jdbc_out_{n}").select(
        "o_orderpriority", "n", "total_cents"
    )


@query(
    "ddl_statement_set_sql",
    oracle="""
    WITH agg AS (
      SELECT n_regionkey,
             CAST(count(*) AS BIGINT) AS n_nations,
             min(n_name) AS first_name
      FROM nation GROUP BY n_regionkey
    )
    SELECT n_regionkey, n_nations, first_name, 'hi' AS bucket
    FROM agg WHERE n_nations >= 5
    UNION ALL
    SELECT n_regionkey, n_nations, first_name, 'lo' AS bucket
    FROM agg WHERE n_nations < 5
    """,
    tags=("ddl", "sql-surface", "statement-set"),
)
def ddl_statement_set_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE STATEMENT SET BEGIN ... END (SqlStatementSet.java:41):
    two INSERTs sharing an aggregate subtree run as one set through the
    common-subgraph machinery (the shared agg persists once), each
    landing in a filesystem sink; the result reads both sinks back.
    The shared-subplan count is asserted — the SQL text must reach the
    same optimizer path as the StatementSet API."""
    from flink_1_16_0_src_spark.tables import load

    t = _tenv(spark)
    n = next(_seq)
    load(spark, sf_dir, "nation").createOrReplaceTempView(f"ss_nation_{n}")
    d = tempfile.mkdtemp()
    hi, lo = os.path.join(d, "hi"), os.path.join(d, "lo")
    for tag, path in (("hi", hi), ("lo", lo)):
        t.execute_sql(
            f"CREATE TABLE ss_sink_{tag}_{n} WITH ('connector'='filesystem',"
            f"'path'='{path}','format'='parquet')"
        )
    shared = (
        f"SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name "
        f"FROM ss_nation_{n} GROUP BY n_regionkey"
    )
    res = t.execute_sql(
        f"EXECUTE STATEMENT SET BEGIN "
        f"INSERT INTO ss_sink_hi_{n} SELECT * FROM ({shared}) WHERE n_nations >= 5; "
        f"INSERT INTO ss_sink_lo_{n} SELECT * FROM ({shared}) WHERE n_nations < 5; "
        f"END"
    ).collect()[0]
    assert res.statements == 2 and res.shared_subplans >= 1
    from pyspark.sql import functions as F

    out_hi = spark.read.parquet(hi).withColumn("bucket", F.lit("hi"))
    out_lo = spark.read.parquet(lo).withColumn("bucket", F.lit("lo"))
    return out_hi.unionByName(out_lo).select(
        "n_regionkey", "n_nations", "first_name", "bucket"
    )


@query(
    "ddl_alter_table_read",
    oracle="""
    SELECT CAST(n_nationkey AS VARCHAR) AS nation_key,
           n_name,
           CAST(NULL AS INT) AS flag,
           CAST(count(*) AS BIGINT) AS n
    FROM nation
    GROUP BY 1, 2, 3
    """,
    tags=("ddl", "sql-surface"),
)
def ddl_alter_table_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE SET / ADD / MODIFY (SqlAlterTableOptions.java,
    SqlAlterTableAdd.java, SqlAlterTableModify.java): options update +
    re-registration, a schema-evolution ADD (null-filled on read), and
    a MODIFY retype (cast-on-read), all visible to the next query."""
    t = _tenv(spark)
    n = next(_seq)
    t.execute_sql(
        f"CREATE TABLE alt_nation_{n} WITH ('connector'='filesystem',"
        f"'path'='{os.path.join(sf_dir, 'nation.parquet')}',"
        f"'format'='parquet','tag'='v1')"
    )
    t.execute_sql(f"ALTER TABLE alt_nation_{n} SET ('tag'='v2')")
    assert t._registrations[f"alt_nation_{n}"]["props"]["tag"] == "v2"
    t.execute_sql(f"ALTER TABLE alt_nation_{n} ADD (flag INT)")
    t.execute_sql(f"ALTER TABLE alt_nation_{n} MODIFY (n_nationkey STRING)")
    return t.sql_query(
        f"""
        SELECT n_nationkey AS nation_key, n_name, flag, count(*) AS n
        FROM alt_nation_{n}
        GROUP BY n_nationkey, n_name, flag
        """
    ).select("nation_key", "n_name", "flag", "n")


@query(
    "ddl_analyze_table_stats",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS null_count,
           CAST(min(o_orderkey) AS VARCHAR) AS min_val,
           CAST(max(o_orderkey) AS VARCHAR) AS max_val,
           CAST(NULL AS BIGINT) AS max_len,
           CAST(count(*) AS BIGINT) AS row_count
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS VARCHAR),
           CAST(max(o_custkey) AS VARCHAR),
           CAST(NULL AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR),
           CAST(max(length(o_orderstatus)) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(count(*) - count(o_orderpriority) AS BIGINT),
           CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR),
           CAST(max(length(o_orderpriority)) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    """,
    tags=("ddl", "sql-surface", "statistics"),
)
def ddl_analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS (FLIP-240 —
    SqlAnalyzeTable.java; AnalyzeTableUtil.java:70-117): the statement
    runs one aggregate pass and stores stats through the catalog's
    alterTable[Column]Statistics SPI; the query then reads the STORED
    stats back off the catalog, so the oracle checks the whole path
    statement → aggregate → catalog → read-back. The hashed surface
    carries the deterministic stats (nullCount, min/max, maxLen,
    rowCount); ndv is APPROX_COUNT_DISTINCT by reference semantics
    (:183) — sketch results are engine-specific, so it is asserted in
    tests (exactness bands), never hashed cross-engine."""
    t = _tenv(spark)
    n = next(_seq)
    from flink_1_16_0_src_spark.tables import load

    tbl = f"an_orders_{n}"
    load(spark, sf_dir, "orders").createOrReplaceTempView(tbl)
    t.execute_sql(
        f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS "
        f"o_orderkey, o_custkey, o_orderstatus, o_orderpriority"
    )
    cat = t.catalog_manager.get_catalog()
    row_count = cat.get_table_statistics(tbl).row_count
    cols = cat.get_table_column_statistics(tbl).column_statistics_data
    rows = [
        (
            c,
            d.null_count,
            str(d.min) if d.min is not None else None,
            str(d.max) if d.max is not None else None,
            d.max_len,
            row_count,
        )
        for c, d in cols.items()
    ]
    return spark.createDataFrame(
        rows,
        "column_name string, null_count bigint, min_val string, "
        "max_val string, max_len bigint, row_count bigint",
    )


@query(
    "ddl_compact_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("ddl", "sql-surface", "connector"),
)
def ddl_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ... COMPACT (SqlAlterTableCompact.java:33; the
    filesystem sink's small-file compaction, FileSystemConnectorOptions
    .java:232): orders is written as 16 small files, compacted to
    target size through the SQL statement, and the aggregate reads
    THROUGH the re-registered view — the oracle over the original rows
    proves compaction is content-preserving. File-count reduction is
    asserted inline (the oracle can't see the filesystem)."""
    import shutil

    from flink_1_16_0_src_spark.tables import load

    t = _tenv(spark)
    n = next(_seq)
    d = tempfile.mkdtemp()
    path = os.path.join(d, "orders_small_files")
    load(spark, sf_dir, "orders").repartition(16).write.parquet(path)
    t.execute_sql(
        f"CREATE TABLE cmp_orders_{n} WITH ('connector'='filesystem',"
        f"'path'='{path}','format'='parquet')"
    )
    t.execute_sql(f"ALTER TABLE cmp_orders_{n} COMPACT")
    n_files = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert n_files < 16, f"compaction left {n_files} files"
    out = t.sql_query(
        f"""
        SELECT o_orderstatus,
               count(*) AS n,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS sum_cents,
               min(o_orderkey) AS min_key,
               max(o_orderkey) AS max_key
        FROM cmp_orders_{n}
        GROUP BY o_orderstatus
        """
    ).select("o_orderstatus", "n", "sum_cents", "min_key", "max_key")
    out = out.localCheckpoint()  # materialize before the tmp dir is removed
    shutil.rmtree(d, ignore_errors=True)
    return out


@query(
    "ddl_compile_execute_plan",
    oracle="""
    SELECT n_regionkey,
           CAST(count(*) AS BIGINT) AS n_nations,
           min(n_name) AS first_name
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("ddl", "sql-surface", "plan"),
)
def ddl_compile_execute_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPILE PLAN / EXECUTE PLAN (FLIP-190 — SqlCompilePlan.java:41,
    SqlExecutePlan.java): the INSERT pipeline is compiled to a plan
    file by one TableEnvironment and EXECUTED by a FRESH one that has
    none of the registrations — the plan file alone must restore the
    source + sink environment and replay the DML. The query reads the
    sink back; the oracle computes the aggregate directly."""
    import shutil

    t = _tenv(spark)
    n = next(_seq)
    d = tempfile.mkdtemp()
    plan_file = os.path.join(d, "plan.json")
    sink_path = os.path.join(d, "out")
    t.execute_sql(
        f"CREATE TABLE plan_src_{n} WITH ('connector'='filesystem',"
        f"'path'='{os.path.join(sf_dir, 'nation.parquet')}',"
        f"'format'='parquet')"
    )
    t.execute_sql(
        f"CREATE TABLE plan_sink_{n} WITH ('connector'='filesystem',"
        f"'path'='{sink_path}','format'='parquet')"
    )
    t.execute_sql(
        f"COMPILE PLAN '{plan_file}' FOR "
        f"INSERT INTO plan_sink_{n} "
        f"SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name "
        f"FROM plan_src_{n} GROUP BY n_regionkey"
    )
    fresh = _tenv(spark)
    fresh.execute_sql(f"EXECUTE PLAN '{plan_file}'")
    out = (
        spark.read.parquet(sink_path)
        .select("n_regionkey", "n_nations", "first_name")
        .localCheckpoint()  # materialize before the tmp dir is removed
    )
    shutil.rmtree(d, ignore_errors=True)
    return out


@query(
    "ddl_create_function_sql",
    oracle="""
    SELECT n_nationkey, upper(reverse(n_name)) AS rev
    FROM nation WHERE n_nationkey % 2 = 0
    """,
    tags=("ddl", "udf", "sql-surface"),
)
def ddl_create_function_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TEMPORARY FUNCTION f AS 'module.attr' LANGUAGE PYTHON
    (SqlCreateFunction.java → FunctionCatalog): the dotted path imports
    through Python (the engine's classpath), the function registers
    into the session catalog and is called from SQL text."""
    from flink_1_16_0_src_spark.tables import load

    t = _tenv(spark)
    t.execute_sql(
        "CREATE TEMPORARY FUNCTION rev_upper AS "
        "'flink_1_16_0_src_spark.functions.udf_examples.reverse_upper' "
        "LANGUAGE PYTHON"
    )
    load(spark, sf_dir, "nation").createOrReplaceTempView("fn_nation")
    return t.sql_query(
        "SELECT n_nationkey, rev_upper(n_name) AS rev "
        "FROM fn_nation WHERE n_nationkey % 2 = 0"
    )


@query(
    "ddl_datagen_sequence",
    oracle="""
    SELECT i, CAST(i + 9 AS BIGINT) AS v,
           CAST(sum(i) OVER (ORDER BY i) AS BIGINT) AS running
    FROM (SELECT unnest(generate_series(1, 40)) AS i)
    """,
    tags=("ddl", "connector", "datagen", "sql-surface"),
)
def ddl_datagen_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datagen connector with SEQUENCE fields
    (DataGenTableSourceFactory — 'fields.<f>.kind'='sequence' with
    start/end): a BOUNDED, fully deterministic generated table (the
    reference's reproducible-fixture mode; the rate-stream random mode
    stays no-oracle-by-design). Two zipped sequences + a running sum
    prove values AND order; random kinds mixed with sequences are
    rejected."""
    from pyspark.sql import functions as F

    t = _tenv(spark)
    n = next(_seq)
    t.execute_sql(
        f"CREATE TABLE dg_seq_{n} (i BIGINT, v BIGINT)"
        f" WITH ('connector'='datagen',"
        f"'fields.i.kind'='sequence','fields.i.start'='1','fields.i.end'='40',"
        f"'fields.v.kind'='sequence','fields.v.start'='10','fields.v.end'='49')"
    )
    from pyspark.sql import Window as W

    base = spark.table(f"dg_seq_{n}")
    # zipped sequences: row k has i = k+1 and v = k+10, so v = i + 9
    # (what the oracle derives)
    return base.select(
        "i", F.col("v").alias("v"),
        F.sum("i").over(W.orderBy("i")).cast("bigint").alias("running"),
    )
