"""Table API fluent surface tests (SURVEY.md §3.2 / PyFlink Table).

Each chain is checked against the equivalent Spark SQL — the same
QueryOperation-vs-SQL equivalence the reference's Table API tests
assert.
"""

from __future__ import annotations

import pytest

from flink_1_16_0_src_spark import tables
from flink_1_16_0_src_spark.table_api import Table, col, lit

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return Table(tables.load(spark, SF_DIR, "orders"))


@pytest.fixture(scope="module")
def customer(spark):
    return Table(tables.load(spark, SF_DIR, "customer"))


def test_select_filter_chain(spark, orders):
    got = (
        orders.filter(col("o_orderstatus") == "O")
        .select(col("o_orderkey"), (col("o_totalprice") * 2).alias("dbl"))
        .order_by(col("o_orderkey"))
        .fetch(5)
        .execute()
    )
    tables.register_views(spark, SF_DIR, ("orders",))
    exp = spark.sql(
        "SELECT o_orderkey, o_totalprice * 2 AS dbl FROM orders "
        "WHERE o_orderstatus = 'O' ORDER BY o_orderkey LIMIT 5"
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in exp.collect()]


def test_group_by_select(spark, orders):
    got = (
        orders.group_by(col("o_orderstatus"))
        .select(col("o_orderstatus"), col("o_totalprice").sum.alias("total"),
                col("o_orderkey").count.alias("n"))
        .execute()
    )
    tables.register_views(spark, SF_DIR, ("orders",))
    exp = spark.sql(
        "SELECT o_orderstatus, sum(o_totalprice) AS total, count(o_orderkey) AS n "
        "FROM orders GROUP BY o_orderstatus"
    )
    g = {r.o_orderstatus: (round(r.total, 4), r.n) for r in got.collect()}
    e = {r.o_orderstatus: (round(r.total, 4), r.n) for r in exp.collect()}
    assert g == e


def test_join_and_setops(spark, orders, customer):
    got = (
        customer.join(orders, on=col("c_custkey") == col("o_custkey"))
        .filter(col("o_totalprice") > 1000)
        .select(col("c_name"), col("o_orderkey"))
        .execute()
    )
    tables.register_views(spark, SF_DIR, ("orders", "customer"))
    exp = spark.sql(
        "SELECT c_name, o_orderkey FROM customer JOIN orders ON c_custkey = o_custkey "
        "WHERE o_totalprice > 1000"
    )
    assert got.count() == exp.count() > 0

    a = orders.select(col("o_custkey")).distinct()
    b = orders.filter(col("o_orderstatus") == "O").select(col("o_custkey")).distinct()
    assert a.minus(b).execute().count() == (
        a.execute().count() - a.intersect(b).execute().count()
    )


def test_add_rename_drop_columns(orders):
    t = (
        orders.add_columns((col("o_totalprice") / 100).alias("hund"))
        .rename_columns(o_orderpriority="prio")
        .drop_columns("o_orderdate")
    )
    cols = t.execute().columns
    assert "hund" in cols and "prio" in cols and "o_orderdate" not in cols


def test_tumble_window_group_by(spark):
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark.table_api import Tumble

    ev = tables.load(spark, SF_DIR, "events")
    got = (
        Table(ev)
        .window(Tumble.over("1 hour").on(col("ts")).alias("w"))
        .group_by(col("w"), col("event_type"))
        .select(
            col("w").start.alias("window_start"),
            col("event_type"),
            col("value").sum.alias("sv"),
        )
        .execute()
    )
    exp = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("window_start"), "event_type", "sv")
    )
    key = lambda r: (r.window_start, r.event_type)
    assert sorted(got.collect(), key=key) == sorted(exp.collect(), key=key)


def test_slide_and_session_windows(spark):
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark.table_api import Session, Slide

    ev = tables.load(spark, SF_DIR, "events")
    got = (
        Table(ev)
        .window(Slide.over("30 minutes").every("10 minutes").on(col("ts")).alias("w"))
        .group_by(col("w"))
        .select(col("w").start.alias("ws"), col("value").count.alias("n"))
        .execute()
    )
    exp = ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w")).agg(
        F.count("value").alias("n")
    )
    assert got.count() == exp.count()

    got_s = (
        Table(ev.where(F.col("user_id") == 1))
        .window(Session.with_gap("30 minutes").on(col("ts")).alias("w"))
        .group_by(col("w"))
        .select(col("w").start.alias("ws"), col("value").count.alias("n"))
        .execute()
    )
    exp_s = (
        ev.where(F.col("user_id") == 1)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("value").alias("n"))
    )
    assert got_s.count() == exp_s.count()


def test_over_window_running_sum(spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark.table_api import Over

    ev = tables.load(spark, SF_DIR, "events").where(F.col("user_id") < 5)
    got = (
        Table(ev)
        .over_window(
            Over.partition_by(col("user_id")).order_by(col("ts")).preceding("unbounded_row").alias("ow")
        )
        .select(
            col("user_id"),
            col("ts"),
            col("value").sum.over(col("ow")).alias("running"),
        )
        .execute()
    )
    w = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    exp = ev.select("user_id", "ts", F.sum("value").over(w).alias("running"))
    key = lambda r: (r.user_id, r.ts)
    assert sorted(got.collect(), key=key) == sorted(exp.collect(), key=key)


def test_offset_fetch_pagination(spark, sf_dir):
    from flink_1_16_0_src_spark import tables
    from flink_1_16_0_src_spark.table_api import Table, col

    t = Table(tables.load(spark, sf_dir, "nation")).order_by(col("n_nationkey"))
    page2 = t.offset(5).fetch(5).to_data_frame().collect()
    assert [r.n_nationkey for r in page2] == [5, 6, 7, 8, 9]


def test_grouped_table_flat_aggregate_top2(spark):
    """Table API flatAggregate == the SQL top-2 window (the reference's
    canonical Top2 TableAggregateFunction example)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark import table_api as T
    from flink_1_16_0_src_spark import tables

    ev = tables.load(spark, "/root/testdata/sf0.001", "events").select("user_id", "value")

    def create_acc():
        return []

    def accumulate(acc, row):
        acc.append(float(row["value"]))
        acc.sort(reverse=True)
        del acc[2:]

    def emit_value(acc):
        for i, v in enumerate(acc):
            yield {"rank_num": i + 1, "value": v}

    got = (
        T.Table(ev)
        .group_by(T.col("user_id"))
        .flat_aggregate(create_acc, accumulate, emit_value,
                        "user_id bigint, rank_num int, value double")
        .to_data_frame()
    )
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    exp = (
        ev.withColumn("rank_num", F.row_number().over(w))
        .where(F.col("rank_num") <= 2)
        .select("user_id", "rank_num", "value")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_changelog_bridge_roundtrip(spark):
    """toChangelogStream → fromChangelogStream is the keyed last-image
    identity (the two §3.3 bridges invert each other)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark import tables
    from flink_1_16_0_src_spark.session import TableEnvironment

    tenv = TableEnvironment(spark)
    ev = tables.load(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_type", "ts", "value"
    )
    log = tenv.to_changelog_stream(ev, keys=["user_id", "event_type"], order_col="ts")
    back = tenv.from_changelog_stream(log, ["user_id", "event_type"], "ts")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc())
    exp = ev.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    cols = ["user_id", "event_type", "ts", "value"]
    assert sorted(map(tuple, back.select(*cols).collect())) == sorted(
        map(tuple, exp.select(*cols).collect())
    )
    # insert-only bridge stamps +I everywhere
    ins = tenv.to_changelog_stream(ev)
    assert ins.where(F.col("__rowkind") != "+I").count() == 0


def test_changelog_bridge_roundtrip_property(spark):
    """Property (hypothesis): toChangelogStream → fromChangelogStream is
    the keyed last-image identity on arbitrary version histories,
    including null values and delete-free multi-version keys."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark.session import TableEnvironment

    tenv = TableEnvironment(spark)

    rows_strategy = st.lists(
        st.tuples(
            st.integers(0, 3),                      # key
            st.integers(0, 50),                     # version order
            st.one_of(st.none(), st.integers(-5, 5)),  # value (nullable)
        ),
        min_size=1, max_size=25,
        unique_by=lambda t: (t[0], t[1]),           # one row per (key, version)
    )

    @given(rows_strategy)
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(rows):
        df = spark.createDataFrame(rows, "k bigint, ver bigint, v bigint")
        log = tenv.to_changelog_stream(df, keys=["k"], order_col="ver")
        # changelog accounting: one +I per key, one -U/+U pair per extra version
        n_keys = len({r[0] for r in rows})
        assert log.count() == n_keys + 2 * (len(rows) - n_keys)
        back = tenv.from_changelog_stream(log, ["k"], "ver")
        w = Window.partitionBy("k").orderBy(F.col("ver").desc())
        exp = df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, exp.collect()))

    check()


def test_with_without_columns_selectors(spark):
    """withColumns/withoutColumns + range_ (BuiltInFunctionDefinitions
    WITH_COLUMNS/WITHOUT_COLUMNS/RANGE_TO; PyFlink expressions.range_)."""
    from flink_1_16_0_src_spark.table_api import range_, with_columns, without_columns

    t = Table(spark.createDataFrame([(1, 2, 3, 4, 5)], "a int, b int, c int, d int, e int"))
    assert t.select(with_columns(range_("b", "d")))._df.columns == ["b", "c", "d"]
    assert t.select(without_columns("c", col("e")))._df.columns == ["a", "b", "d"]
    # mixing a selector with plain expressions, duplicates collapse
    assert t.select(with_columns(col("a"), range_("a", "b")))._df.columns == ["a", "b"]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="reversed"):
        t.select(with_columns(range_("d", "b")))
    with _pytest.raises(ValueError, match="not in schema"):
        t.select(without_columns("zz"))


def test_row_based_map_flat_map_and_replace_columns(spark):
    """Table.map / flat_map (PyFlink row-based operations, Arrow-batched
    here) and add_or_replace_columns."""
    t = Table(spark.createDataFrame([(1, "x"), (2, "y")], "a int, s string"))

    doubled = t.map(lambda b: b.assign(a=b.a * 2)[["a", "s"]], "a int, s string")
    assert sorted(map(tuple, doubled._df.collect())) == [(2, "x"), (4, "y")]

    def explode_batch(b):
        import pandas as pd
        rows = [(r.a, i) for r in b.itertuples() for i in range(r.a)]
        return pd.DataFrame(rows, columns=["a", "i"])

    fanned = t.flat_map(explode_batch, "a int, i int")
    assert sorted(map(tuple, fanned._df.collect())) == [(1, 0), (2, 0), (2, 1)]

    rep = t.add_or_replace_columns(a=col("a") + lit(10), b=lit("new"))
    assert rep._df.columns == ["a", "s", "b"]
    assert sorted(map(tuple, rep._df.collect())) == [(11, "x", "new"), (12, "y", "new")]
