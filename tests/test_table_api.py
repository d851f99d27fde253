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
