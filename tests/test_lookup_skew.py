"""Lookup join (external probe) + skew salting tests (SURVEY.md §2.4).

Lookup functions are built as local closures (cloudpickle ships them by
value — the tests package is not importable on executors), and probe
accounting uses Spark accumulators (executor-side counters don't
propagate otherwise).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_1_16_0_src_spark import tables
from flink_1_16_0_src_spark.operators.lookup import lookup_join
from flink_1_16_0_src_spark.operators.skew import salted_join

SF_DIR = "/root/testdata/sf0.001"

OUT = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_nationkey", LongType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", LongType()),
    ]
)


@pytest.fixture(scope="module")
def store(spark):
    return {
        r.n_nationkey: {"n_name": r.n_name, "n_regionkey": r.n_regionkey}
        for r in tables.load(spark, SF_DIR, "nation").collect()
    }


def _mk_lookup(store):
    def lookup(keys):
        return {k: store[k] for k in keys if k in store}

    return lookup


def test_lookup_join_matches_broadcast_join(spark, store):
    sup = tables.load(spark, SF_DIR, "supplier").select("s_suppkey", "s_nationkey")
    got = lookup_join(sup, _mk_lookup(store), "s_nationkey", ["n_name", "n_regionkey"], OUT)
    exp = sup.join(
        F.broadcast(tables.load(spark, SF_DIR, "nation")),
        sup.s_nationkey == F.col("n_nationkey"),
        "left",
    ).select("s_suppkey", "s_nationkey", "n_name", "n_regionkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_lookup_join_inner_drops_misses(spark, store):
    sup = tables.load(spark, SF_DIR, "supplier").select("s_suppkey", "s_nationkey")
    shifted = sup.withColumn(
        "s_nationkey",
        F.when(F.col("s_suppkey") % 2 == 0, F.col("s_nationkey") + 1000).otherwise(
            F.col("s_nationkey")
        ),
    )
    got = lookup_join(
        shifted, _mk_lookup(store), "s_nationkey", ["n_name", "n_regionkey"], OUT, how="inner"
    )
    assert got.count() == shifted.where("s_nationkey < 1000").count()
    assert got.where("n_name IS NULL").count() == 0


def test_lookup_join_batches_not_rows(spark, store):
    calls = spark.sparkContext.accumulator(0)
    inner = _mk_lookup(store)

    def counted(keys):
        calls.add(1)
        return inner(keys)

    sup = tables.load(spark, SF_DIR, "supplier").select("s_suppkey", "s_nationkey").coalesce(1)
    n_rows = sup.count()
    lookup_join(sup, counted, "s_nationkey", ["n_name", "n_regionkey"], OUT).count()
    assert calls.value <= 5 < n_rows  # per-batch distinct-key probing, not per-row


def test_lookup_join_concurrent(spark, store):
    sup = tables.load(spark, SF_DIR, "supplier").select("s_suppkey", "s_nationkey")
    got = lookup_join(
        sup, _mk_lookup(store), "s_nationkey", ["n_name", "n_regionkey"], OUT,
        batch_size=2, concurrency=4,
    )
    assert got.where("n_name IS NOT NULL").count() == sup.count()


def test_salted_join_matches_plain(spark):
    li = tables.load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    sup = tables.load(spark, SF_DIR, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    got = salted_join(li, sup, "l_suppkey", n_salts=8)
    exp = li.join(sup, "l_suppkey")
    assert got.count() == exp.count()
    assert got.agg(F.round(F.sum("l_quantity"), 2)).collect() == exp.agg(
        F.round(F.sum("l_quantity"), 2)
    ).collect()


def test_salted_join_hot_keys_only(spark):
    li = tables.load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    sup = tables.load(spark, SF_DIR, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    hot = li.groupBy("l_suppkey").count().orderBy(F.desc("count")).limit(3).select("l_suppkey")
    got = salted_join(li, sup, "l_suppkey", n_salts=8, hot_keys=hot)
    exp = li.join(sup, "l_suppkey")
    assert got.count() == exp.count()


def test_salted_join_left_outer(spark):
    li = tables.load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    sup = (
        tables.load(spark, SF_DIR, "supplier")
        .where("s_suppkey <= 5")
        .select(F.col("s_suppkey").alias("l_suppkey"), "s_name")
    )
    got = salted_join(li, sup, "l_suppkey", n_salts=4, how="left")
    exp = li.join(sup, "l_suppkey", "left")
    assert got.count() == exp.count()
    assert got.where("s_name IS NULL").count() == exp.where("s_name IS NULL").count()


class TestRetryPolicy:
    """RetryableLookupFunctionDelegator.java:32 parity: fixed-delay
    retry wrapping the batched probe, composing with cache/concurrency,
    with a terminal-miss policy after exhaustion."""

    SCHEMA = StructType(
        [
            StructField("k", LongType()),
            StructField("nm", StringType()),
            StructField("attempt", LongType()),
        ]
    )

    def test_transient_exception_retried_then_enriched(self, spark):
        from flink_1_16_0_src_spark.operators.lookup import RetryPolicy

        def flaky(keys):
            # per-worker closure state: fails the first 2 calls
            st = flaky.__dict__.setdefault("calls", {"n": 0})
            st["n"] += 1
            if st["n"] <= 2:
                raise RuntimeError("transient store hiccup")
            return {k: {"nm": f"v{k}", "attempt": st["n"]} for k in keys}

        df = spark.range(4).select(F.col("id").alias("k")).repartition(1)
        got = lookup_join(
            df, flaky, "k", ["nm", "attempt"], self.SCHEMA,
            retry=RetryPolicy(max_attempts=3, delay=0.01),
        )
        rows = {r.k: (r.nm, r.attempt) for r in got.collect()}
        assert rows == {k: (f"v{k}", 3) for k in range(4)}

    def test_retry_on_miss_per_key_attempts_and_terminal_miss(self, spark):
        from flink_1_16_0_src_spark.operators.lookup import RetryPolicy

        def eventually(keys):
            # key k becomes visible on its (k % 3 + 1)-th probe —
            # eventually-consistent store; records per-key attempts
            att = eventually.__dict__.setdefault("att", {})
            out = {}
            for k in keys:
                att[k] = att.get(k, 0) + 1
                if att[k] >= (k % 3) + 1:
                    out[k] = {"nm": f"v{k}", "attempt": att[k]}
            return out

        df = spark.range(6).select(F.col("id").alias("k")).repartition(1)
        got = lookup_join(
            df, eventually, "k", ["nm", "attempt"], self.SCHEMA,
            retry=RetryPolicy(max_attempts=2, delay=0.0, retry_on_miss=True),
        )
        rows = {r.k: (r.nm, r.attempt) for r in got.collect()}
        # keys needing 1 or 2 attempts enrich with their attempt count;
        # keys needing 3 exhaust max_attempts=2 -> TERMINAL miss (nulls)
        for k in range(6):
            need = (k % 3) + 1
            assert rows[k] == ((f"v{k}", need) if need <= 2 else (None, None))

    def test_terminal_miss_dropped_when_inner(self, spark):
        from flink_1_16_0_src_spark.operators.lookup import RetryPolicy

        def never(keys):
            return {}

        df = spark.range(5).select(F.col("id").alias("k")).repartition(1)
        got = lookup_join(
            df, never, "k", ["nm", "attempt"], self.SCHEMA, how="inner",
            retry=RetryPolicy(max_attempts=2, retry_on_miss=True),
        )
        assert got.count() == 0

    def test_exception_on_last_attempt_propagates(self, spark):
        from flink_1_16_0_src_spark.operators.lookup import RetryPolicy

        def always_down(keys):
            raise RuntimeError("store down")

        df = spark.range(3).select(F.col("id").alias("k")).repartition(1)
        got = lookup_join(
            df, always_down, "k", ["nm", "attempt"], self.SCHEMA,
            retry=RetryPolicy(max_attempts=2, delay=0.0),
        )
        with pytest.raises(Exception, match="store down"):
            got.collect()
