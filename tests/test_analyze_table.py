"""ANALYZE TABLE ... COMPUTE STATISTICS (FLIP-240, new in Flink 1.16).

Reference parity: SqlAnalyzeTable.java (grammar), AnalyzeTableUtil.java
:70-117 (execution — one aggregate query per target, stats written
through the catalog's alterTableStatistics / alterTableColumnStatistics
SPI), :170-233 (per-type column-stat selects), :121-135 (per-column
merge of successive runs), AnalyzeTableITCase (expected stats values).
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def tenv(spark):
    from flink_1_16_0_src_spark.session import TableEnvironment

    return TableEnvironment(spark)


def _register(tenv, sf_dir, table, name):
    from flink_1_16_0_src_spark.tables import load

    load(tenv.spark, sf_dir, table).createOrReplaceTempView(name)


def test_table_stats_row_count(tenv, sf_dir):
    _register(tenv, sf_dir, "nation", "an_nation")
    tenv.execute_sql("ANALYZE TABLE an_nation COMPUTE STATISTICS")
    cat = tenv.catalog_manager.get_catalog()
    stats = cat.get_table_statistics("an_nation")
    assert stats.row_count == tenv.spark.table("an_nation").count()
    # AnalyzeTableUtil passes -1 for file/size fields (:236-239)
    assert stats.file_count == -1
    # no FOR COLUMNS → no column stats recorded
    assert cat.get_table_column_statistics("an_nation").column_statistics_data == {}


def test_column_stats_numeric_and_string(tenv, sf_dir):
    _register(tenv, sf_dir, "nation", "an_nation2")
    tenv.execute_sql(
        "ANALYZE TABLE an_nation2 COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_name"
    )
    cat = tenv.catalog_manager.get_catalog()
    col = cat.get_table_column_statistics("an_nation2").column_statistics_data
    df = tenv.spark.table("an_nation2")
    n = df.count()
    key = col["n_nationkey"]
    assert key.null_count == 0
    assert key.min == 0 and key.max == n - 1
    # APPROX_COUNT_DISTINCT (AnalyzeTableUtil:183): sketch accuracy —
    # within the default 5% rsd on 25 distinct keys it is exact
    assert abs(key.ndv - n) <= max(2, n * 0.1)
    name = col["n_name"]
    assert name.max_len == max(
        len(r.n_name) for r in df.select("n_name").collect()
    )
    assert name.avg_len == pytest.approx(
        sum(len(r.n_name) for r in df.select("n_name").collect()) / n
    )
    assert name.min is None and name.max is None  # string variant has no min/max


def test_for_all_columns_and_merge(tenv, sf_dir):
    _register(tenv, sf_dir, "region", "an_region")
    tenv.execute_sql(
        "ANALYZE TABLE an_region COMPUTE STATISTICS FOR COLUMNS r_regionkey"
    )
    tenv.execute_sql(
        "ANALYZE TABLE an_region COMPUTE STATISTICS FOR COLUMNS r_name"
    )
    cat = tenv.catalog_manager.get_catalog()
    col = cat.get_table_column_statistics("an_region").column_statistics_data
    # merge semantics (AnalyzeTableUtil.mergeColumnStatistics:121-135):
    # the first run's column survives the second run
    assert set(col) == {"r_regionkey", "r_name"}
    tenv.execute_sql("ANALYZE TABLE an_region COMPUTE STATISTICS FOR ALL COLUMNS")
    col = cat.get_table_column_statistics("an_region").column_statistics_data
    assert set(col) == set(tenv.spark.table("an_region").columns)


def test_boolean_true_false_counts(tenv, spark):
    spark.createDataFrame(
        [(True,), (True,), (False,), (None,)], "flag boolean"
    ).createOrReplaceTempView("an_flags")
    tenv.execute_sql("ANALYZE TABLE an_flags COMPUTE STATISTICS FOR COLUMNS flag")
    col = (
        tenv.catalog_manager.get_catalog()
        .get_table_column_statistics("an_flags")
        .column_statistics_data["flag"]
    )
    assert (col.true_count, col.false_count, col.null_count) == (2, 1, 1)
    assert col.ndv is None  # boolean variant carries no ndv (ref :260-264)


def test_partitioned_grouped_single_pass(tenv, sf_dir, tmp_path):
    """PARTITION(key) with a bare key: stats land per partition value.
    The reference loops one query per partition (:82-97); here it is
    one grouped aggregate — same stored stats, one scan."""
    from flink_1_16_0_src_spark.tables import load

    src = load(tenv.spark, sf_dir, "nation")
    path = os.path.join(str(tmp_path), "nation_part")
    src.write.partitionBy("n_regionkey").parquet(path)
    tenv.execute_sql(
        f"CREATE TABLE an_part (n_nationkey BIGINT, n_name STRING, "
        f"n_comment STRING) PARTITIONED BY (n_regionkey) "
        f"WITH ('connector'='filesystem','path'='{path}','format'='parquet')"
    )
    tenv.execute_sql(
        "ANALYZE TABLE an_part PARTITION(n_regionkey) "
        "COMPUTE STATISTICS FOR COLUMNS n_nationkey"
    )
    cat = tenv.catalog_manager.get_catalog()
    expected = {
        r.n_regionkey: r.cnt
        for r in src.groupBy("n_regionkey").count().withColumnRenamed("count", "cnt").collect()
    }
    for rk, cnt in expected.items():
        pstats = cat.get_partition_statistics("an_part", {"n_regionkey": rk})
        assert pstats.row_count == cnt
        pcol = cat.get_partition_column_statistics(
            "an_part", {"n_regionkey": rk}
        ).column_statistics_data["n_nationkey"]
        assert pcol.null_count == 0

    # a single fully-valued spec analyzes exactly that partition
    some_rk = sorted(expected)[0]
    tenv.execute_sql(
        f"ANALYZE TABLE an_part PARTITION(n_regionkey={some_rk}) COMPUTE STATISTICS"
    )
    assert (
        cat.get_partition_statistics("an_part", {"n_regionkey": some_rk}).row_count
        == expected[some_rk]
    )


def test_validation_errors(tenv, sf_dir, tmp_path):
    _register(tenv, sf_dir, "region", "an_region_err")
    with pytest.raises(ValueError, match="not a partitioned table"):
        tenv.execute_sql(
            "ANALYZE TABLE an_region_err PARTITION(r_name='x') COMPUTE STATISTICS"
        )
    with pytest.raises(ValueError, match="no such columns"):
        tenv.execute_sql(
            "ANALYZE TABLE an_region_err COMPUTE STATISTICS FOR COLUMNS nope"
        )
    from flink_1_16_0_src_spark.tables import load

    path = os.path.join(str(tmp_path), "region_part")
    load(tenv.spark, sf_dir, "region").write.partitionBy("r_regionkey").parquet(path)
    tenv.execute_sql(
        f"CREATE TABLE an_part_err (r_name STRING, r_comment STRING) "
        f"PARTITIONED BY (r_regionkey) "
        f"WITH ('connector'='filesystem','path'='{path}','format'='parquet')"
    )
    with pytest.raises(ValueError, match="PARTITION.*required"):
        tenv.execute_sql("ANALYZE TABLE an_part_err COMPUTE STATISTICS")
