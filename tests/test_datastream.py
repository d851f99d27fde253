"""DataStream fluent API tests (SURVEY.md §2.10 parity checklist)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_1_16_0_src_spark import tables
from flink_1_16_0_src_spark.datastream import DataStream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return tables.load(spark, SF_DIR, "events")


def test_map_expr_and_filter(events):
    ds = DataStream(events)
    out = (
        ds.filter(F.col("event_type") == "purchase")
        .map({"user_id": F.col("user_id"), "doubled": F.col("value") * 2})
        .df
    )
    rows = out.collect()
    assert len(rows) == events.where("event_type = 'purchase'").count()
    src = events.where("event_type = 'purchase'").select("value").collect()
    assert {round(r.doubled, 4) for r in rows} == {round(r.value * 2, 4) for r in src}


def test_map_callable(events):
    schema = StructType([StructField("uid", LongType()), StructField("vx", DoubleType())])
    ds = DataStream(events.select("user_id", "value").limit(100))
    out = ds.map(lambda r: {"uid": r["user_id"], "vx": r["value"] + 1}, schema).df
    assert out.count() == 100
    assert out.schema.fieldNames() == ["uid", "vx"]


def test_flat_map(events):
    schema = StructType([StructField("tok", StringType())])
    ds = DataStream(events.select("event_type").limit(10))
    out = ds.flat_map(lambda r: [{"tok": c} for c in r["event_type"]], schema).df
    exp = sum(len(r.event_type) for r in events.select("event_type").limit(10).collect())
    assert out.count() == exp


def test_key_by_sum_min_max(events):
    ds = DataStream(events.select("user_id", "value"))
    got = {r.user_id: round(r.value, 4) for r in ds.key_by("user_id").sum("value").df.collect()}
    exp = {
        r.user_id: round(r.s, 4)
        for r in events.groupBy("user_id").agg(F.sum("value").alias("s")).collect()
    }
    assert got == exp


def test_min_by_returns_whole_row(events):
    ds = DataStream(events.select("user_id", "event_id", "value"))
    got = {r.user_id: r.event_id for r in ds.key_by("user_id").min_by("value").df.collect()}
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("value").asc(), F.col("event_id"))
    exp_df = (
        events.select("user_id", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
    )
    exp = {r.user_id: r.event_id for r in exp_df.collect()}
    # min_by breaks value-ties arbitrarily; compare the value, not the id
    vals = {r.user_id: r.value for r in ds.key_by("user_id").min_by("value").df.collect()}
    exp_vals = {r.user_id: r.value for r in exp_df.collect()}
    assert vals == exp_vals
    assert set(got) == set(exp)


def test_reduce(events):
    schema = StructType([StructField("user_id", LongType()), StructField("value", DoubleType())])
    ds = DataStream(events.select("user_id", "value"))

    def add(a, b):
        return {"user_id": a["user_id"], "value": a["value"] + b["value"]}

    got = {r.user_id: round(r.value, 4) for r in ds.key_by("user_id").reduce(add, schema).df.collect()}
    exp = {
        r.user_id: round(r.s, 4)
        for r in events.groupBy("user_id").agg(F.sum("value").alias("s")).collect()
    }
    assert got == exp


def test_union_and_partitioning(events):
    a = DataStream(events.where("event_type = 'click'"))
    b = DataStream(events.where("event_type = 'error'"))
    u = a.union(b)
    assert u.df.count() == events.where("event_type IN ('click','error')").count()
    assert u.rebalance().df.count() == u.df.count()
    assert u.global_().df.rdd.getNumPartitions() == 1
    assert u.partition_custom(F.col("user_id")).df.count() == u.df.count()


def test_windowed_aggregate(events):
    ds = DataStream(events)
    out = (
        ds.key_by("user_id")
        .window("ts", "1 hour")
        .aggregate(F.count("*").alias("cnt"))
        .df
    )
    exp = events.groupBy(F.window("ts", "1 hour"), "user_id").count()
    assert out.count() == exp.count()
    assert out.agg(F.sum("cnt")).collect()[0][0] == events.count()


def test_count_window(events):
    ds = DataStream(events.select("user_id", "value"))
    out = ds.key_by("user_id").count_window(10).aggregate(F.count("*").alias("cnt")).df
    per_user = {r.user_id: r.cnt for r in events.groupBy("user_id").count().withColumnRenamed("count", "cnt").collect()}
    got = out.groupBy("user_id").agg(F.sum("cnt").alias("total"), F.max("cnt").alias("mx")).collect()
    for r in got:
        assert r.total == per_user[r.user_id]
        assert r.mx <= 10


def test_co_group(events):
    import pandas as pd

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_click", LongType()),
            StructField("n_error", LongType()),
        ]
    )
    clicks = DataStream(events.where("event_type = 'click'").select("user_id", "value"))
    errors = DataStream(events.where("event_type = 'error'").select("user_id", "value"))

    def fn(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        uid = l["user_id"].iloc[0] if len(l) else r["user_id"].iloc[0]
        return pd.DataFrame([{"user_id": uid, "n_click": len(l), "n_error": len(r)}])

    out = clicks.co_group(errors, ["user_id"], ["user_id"], fn, schema).df
    exp_clicks = {r.user_id: r["count"] for r in events.where("event_type='click'").groupBy("user_id").count().collect()}
    got = {r.user_id: (r.n_click, r.n_error) for r in out.collect()}
    for uid, (nc, ne) in got.items():
        assert nc == exp_clicks.get(uid, 0)


def test_interval_join_batch(events):
    purchases = DataStream(
        events.where("event_type = 'purchase'").select("user_id", "ts", F.col("value").alias("pv"))
    ).key_by("user_id")
    clicks = DataStream(
        events.where("event_type = 'click'").select(
            F.col("user_id").alias("cuid"), F.col("ts").alias("cts"), F.col("value").alias("cv")
        )
    ).key_by("cuid")
    out = purchases.interval_join(clicks, ("ts", "cts"), "10 minutes", "10 minutes").df
    exp = events.where("event_type='purchase'").alias("p").join(
        events.where("event_type='click'").alias("c"),
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("p.ts") >= F.col("c.ts") - F.expr("INTERVAL 10 minutes"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 10 minutes")),
    )
    assert out.count() == exp.count()


def test_write_sinks(events, tmp_path):
    ds = DataStream(events.select("user_id", "event_type").limit(50))
    ds.write_as_csv(str(tmp_path / "csv"))
    ds.write_as_text(str(tmp_path / "txt"))
    spark = events.sparkSession
    assert spark.read.option("header", True).csv(str(tmp_path / "csv")).count() == 50
    assert spark.read.text(str(tmp_path / "txt")).count() == 50


def test_connect_co_map(events):
    """connect (DataStream.java:257) + CoMapFunction: each side mapped
    by its own fn into a common output type."""
    clicks = DataStream(events.where("event_type = 'click'").select("event_id", "value"))
    buys = DataStream(events.where("event_type = 'purchase'").select("event_id", "value"))
    out = clicks.connect(buys).co_map(
        lambda r: {"event_id": r["event_id"], "signal": r["value"]},
        lambda r: {"event_id": r["event_id"], "signal": -r["value"]},
        "event_id long, signal double",
    ).df
    n_clicks = events.where("event_type = 'click'").count()
    n_buys = events.where("event_type = 'purchase'").count()
    assert out.count() == n_clicks + n_buys
    assert out.where("signal < 0").count() == events.where(
        "event_type = 'purchase' AND value > 0"
    ).count()


def test_connect_co_flat_map(events):
    a = DataStream(events.limit(5).select("event_id"))
    b = DataStream(events.limit(3).select("event_id"))
    out = a.connect(b).co_flat_map(
        lambda r: [{"eid": r["event_id"]}, {"eid": -r["event_id"]}],
        lambda r: [],
        "eid long",
    ).df
    assert out.count() == 10  # side-1 doubles, side-2 swallowed


def test_keyed_co_process(events):
    """CoProcessFunction with per-key shared state: count both sides."""
    clicks = events.where("event_type = 'click'").select("user_id", "value")
    buys = events.where("event_type = 'purchase'").select("user_id", "value")

    def fn(lpdf, rpdf):
        import pandas as pd

        uid = (lpdf if len(lpdf) else rpdf)["user_id"].iloc[0]
        return pd.DataFrame([{"user_id": uid, "n_click": len(lpdf), "n_buy": len(rpdf)}])

    out = (
        DataStream(clicks)
        .connect(DataStream(buys))
        .keyed_co_process(("user_id", "user_id"), fn, "user_id long, n_click long, n_buy long")
        .df
    )
    expect = (
        events.where("event_type IN ('click','purchase')")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("b"),
        )
    )
    got = {(r.user_id): (r.n_click, r.n_buy) for r in out.collect()}
    for r in expect.collect():
        assert got[r.user_id] == (r.c, r.b)


def test_connect_broadcast_state(events):
    """Broadcast state pattern: small rule stream joined against every
    task's slice without shuffling the data side."""
    rules = DataStream(
        events.sparkSession.createDataFrame(
            [("click", 2.0), ("purchase", 10.0)], "etype string, weight double"
        )
    )

    def apply_rules(pdf, ctl):
        m = dict(zip(ctl["etype"], ctl["weight"]))
        pdf = pdf[pdf["event_type"].isin(m)].copy()
        pdf["scored"] = pdf["value"] * pdf["event_type"].map(m)
        return pdf[["event_id", "scored"]]

    out = DataStream(events).connect_broadcast(
        rules, apply_rules, "event_id long, scored double"
    ).df
    assert out.count() == events.where("event_type IN ('click','purchase')").count()
    one = events.where("event_type = 'purchase'").select("event_id", "value").first()
    got = out.where(F.col("event_id") == one.event_id).first()
    assert abs(got.scored - one.value * 10.0) < 1e-9


def test_side_outputs(events):
    """OutputTag routing: one pass, three filtered outputs."""

    def route(r):
        if r["value"] > 5:
            yield ("big", {"event_id": r["event_id"], "value": r["value"]})
        else:
            yield ("main", {"event_id": r["event_id"], "value": r["value"]})
        if r["event_type"] == "error":
            yield ("errors", {"event_id": r["event_id"], "value": r["value"]})

    outs = DataStream(events).process_with_side_outputs(
        route, "event_id long, value double", tags=["big", "errors"]
    )
    assert set(outs) == {"main", "big", "errors"}
    n_big = outs["big"].df.count()
    n_main = outs["main"].df.count()
    assert n_big == events.where("value > 5").count()
    assert n_main == events.where("value <= 5").count()
    assert outs["errors"].df.count() == events.where("event_type = 'error'").count()


def test_iterate_decrement_until_zero(spark):
    """IterateExample semantics: each superstep decrements positive
    values back into the head, emits zeros; every input row must come
    out exactly once as zero, within a bounded iteration count."""
    src = spark.range(1, 11).select(F.col("id").alias("n"), F.col("id").alias("orig"))

    def step(ds):
        dec = ds.map({"n": F.col("n") - 1, "orig": F.col("orig")})
        return dec.filter(F.col("n") > 0), dec.filter(F.col("n") <= 0)

    out = DataStream(src).iterate(step, max_iterations=50).df
    rows = {r.orig: r.n for r in out.collect()}
    assert rows == {i: 0 for i in range(1, 11)}


def test_iterate_respects_max_iterations(spark):
    src = spark.range(0, 4).select(F.col("id").alias("n"))

    def step(ds):
        # never-terminating feedback: everything loops forever
        return ds.map({"n": F.col("n") + 1}), ds.filter(F.lit(False))

    out = DataStream(src).iterate(step, max_iterations=3).df
    assert out.count() == 0  # no outputs, but the loop ended


def test_async_io_ordered_and_unordered(spark):
    """AsyncDataStream parity: thread-pooled per-batch enrichment.
    Ordered mode preserves input order inside each batch; unordered
    returns the same SET; both amortize a per-request sleep across the
    pool (wall-clock sanity: 32 x 30ms at capacity 16 << serial)."""
    import time

    from flink_1_16_0_src_spark.datastream import DataStream

    df = spark.createDataFrame([(i,) for i in range(32)], "x long").coalesce(1)

    def slow_lookup(row):
        import threading

        time.sleep(0.03)
        return {"x": row["x"], "y": row["x"] * 2, "tid": threading.get_ident()}

    ordered = DataStream(df).async_io(
        slow_lookup, "x long, y long, tid long", capacity=16
    ).df.collect()
    assert [(r.x, r.y) for r in ordered] == [(i, 2 * i) for i in range(32)]
    # pooled, not serial: requests ran on multiple worker threads
    assert len({r.tid for r in ordered}) > 1

    unordered = DataStream(df).async_io(
        slow_lookup, "x long, y long, tid long", capacity=16, ordered=False
    ).df.collect()
    assert {(r.x, r.y) for r in unordered} == {(i, 2 * i) for i in range(32)}


def test_async_io_unordered_timeout_fires(spark):
    """r2 ADVICE: the unordered path's timeout must actually fire — a
    request still pending timeout_s after batch submission raises
    (previously as_completed had no deadline and a hung request blocked
    forever)."""
    import pytest

    from flink_1_16_0_src_spark.datastream import DataStream

    df = spark.createDataFrame([(i,) for i in range(4)], "x long").coalesce(1)

    def hang_one(row):
        import time

        if row["x"] == 2:
            time.sleep(5)
        return {"x": row["x"]}

    out = DataStream(df).async_io(
        hang_one, "x long", capacity=4, ordered=False, timeout_s=0.5
    )
    with pytest.raises(Exception, match="(?i)timeout"):
        out.df.collect()


def test_window_all_matches_keyed_window_union(spark):
    """windowAll = non-keyed time windows (DataStream.java:871): per
    window, the count equals the sum of the keyed windows' counts."""
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark import tables
    from flink_1_16_0_src_spark.datastream import DataStream

    ev = tables.load(spark, "/root/testdata/sf0.001", "events")
    all_win = (
        DataStream(ev)
        .window_all("ts", "1 hour")
        .aggregate(F.count("*").alias("n"))
        .df.collect()
    )
    keyed = (
        DataStream(ev)
        .key_by("user_id")
        .window("ts", "1 hour")
        .aggregate(F.count("*").alias("n"))
        .df.groupBy("window")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    a = {(r.window.start, r.window.end): r.n for r in all_win}
    b = {(r.window.start, r.window.end): r.n for r in keyed}
    assert a == b and len(a) > 0
