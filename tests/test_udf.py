"""UDF surface tests (SURVEY.md §2.12 — PyFlink udf/udtf/udaf parity)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_1_16_0_src_spark import tables
from flink_1_16_0_src_spark.functions.udf import udaf, udf, udtf

SF_DIR = "/root/testdata/sf0.001"


def test_scalar_udf_general(spark):
    @udf("bigint")
    def add_one(x):
        return x + 1

    n = tables.load(spark, SF_DIR, "nation")
    got = {r.k: r.k1 for r in n.select(F.col("n_nationkey").alias("k"), add_one("n_nationkey").alias("k1")).collect()}
    assert all(v == k + 1 for k, v in got.items())


def test_scalar_udf_pandas(spark):
    @udf("double", func_type="pandas")
    def times_two(s: pd.Series) -> pd.Series:
        return s * 2.0

    ev = tables.load(spark, SF_DIR, "events").limit(100)
    rows = ev.select("value", times_two("value").alias("v2")).collect()
    assert all(abs(r.v2 - 2 * r.value) < 1e-9 for r in rows)


def test_udtf_emits_multiple_rows(spark):
    @udtf("word: string, length: int")
    def split_words(text: str):
        for w in (text or "").split("_"):
            yield (w, len(w))

    out = split_words(F.lit("a_bb_ccc"))
    rows = [(r.word, r.length) for r in out.collect()]
    assert rows == [("a", 1), ("bb", 2), ("ccc", 3)]


def test_udaf_grouped_agg(spark):
    @udaf("double")
    def value_range(s: pd.Series) -> float:
        return float(s.max() - s.min())

    ev = tables.load(spark, SF_DIR, "events")
    got = {r.user_id: r.rng for r in ev.groupBy("user_id").agg(value_range("value").alias("rng")).collect()}
    exp = {
        r.user_id: round(r.mx - r.mn, 9)
        for r in ev.groupBy("user_id").agg(F.max("value").alias("mx"), F.min("value").alias("mn")).collect()
    }
    assert {k: round(v, 9) for k, v in got.items()} == exp


def test_streaming_window_topn(spark):
    from flink_1_16_0_src_spark.streaming import sources, windows

    sdf = sources.stream_table(spark, SF_DIR, "events", watermark=("ts", "10 minutes"))
    out = windows.window_topn(
        sdf, "ts", "1 hour", ["event_type"], "value", 3, payload=["event_id", "user_id"]
    )
    got = sources.run_to_memory(out, "w_topn", "append")

    ev = tables.load(spark, SF_DIR, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy(F.window("ts", "1 hour"), "event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    exp = (
        ev.withColumn("rank_num", F.row_number().over(w))
        .where(F.col("rank_num") <= 3)
        .withColumn("window_start", F.window("ts", "1 hour").start)
    )
    wm = ev.select((F.max("ts") - F.expr("INTERVAL 10 minutes")).alias("wm")).collect()[0]["wm"]
    exp = exp.where(F.window("ts", "1 hour").end <= F.lit(wm))
    # compare per-window top value sets (ties in `value` make id-level order ambiguous)
    cols = ["window_start", "event_type", "rank_num", "value"]
    g = [tuple(r) for r in got.select(*cols).orderBy(*cols).collect()]
    e = [tuple(r) for r in exp.select(*cols).orderBy(*cols).collect()]
    assert g == e and len(g) > 0


def test_raw_codec_roundtrip(spark, sf_dir):
    """RAW type (RawType.java): opaque binary survives shuffle/group;
    only the declared codec reads it back."""
    from flink_1_16_0_src_spark.functions.raw_codec import raw_decode, raw_encode
    from flink_1_16_0_src_spark import tables

    ev = (
        tables.load(spark, sf_dir, "events")
        .where(F.col("event_id") % 501 == 0)
        .select("event_id", "user_id", F.struct("event_type", "value").alias("payload"))
    )
    enc = ev.select("event_id", "user_id", raw_encode("payload").alias("raw"))
    assert dict(enc.dtypes)["raw"] == "binary"

    # engine-side ops on the opaque column: shuffle + keep-first per user
    shuffled = enc.repartition(8, "user_id").groupBy("user_id").agg(
        F.min_by(F.col("raw"), F.col("event_id")).alias("raw"),
        F.min("event_id").alias("event_id"),
    )
    dec = shuffled.select(
        "event_id",
        raw_decode("raw", lambda obj: float(obj["value"]), "double").alias("val"),
    )
    got = {r.event_id: round(r.val, 6) for r in dec.collect()}

    exp_rows = (
        ev.select("event_id", "user_id", F.col("payload.value").alias("value"))
        .groupBy("user_id")
        .agg(F.min_by("value", "event_id").alias("value"), F.min("event_id").alias("event_id"))
        .collect()
    )
    exp = {r.event_id: round(r.value, 6) for r in exp_rows}
    assert got == exp and len(got) > 0


def test_udtaf_decorator_top2(spark):
    """pyflink-style @udtaf class (TableAggregateFunction contract) ==
    the SQL top-2 window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark import tables
    from flink_1_16_0_src_spark.functions.udf import udtaf

    @udtaf("user_id bigint, rank_num int, value double")
    class Top2:
        def create_accumulator(self):
            return []

        def accumulate(self, acc, row):
            acc.append(float(row["value"]))
            acc.sort(reverse=True)
            del acc[2:]

        def emit_value(self, acc):
            for i, v in enumerate(acc):
                yield {"rank_num": i + 1, "value": v}

    ev = tables.load(spark, "/root/testdata/sf0.001", "events").select("user_id", "value")
    got = Top2(ev, ["user_id"])
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    exp = (
        ev.withColumn("rank_num", F.row_number().over(w))
        .where(F.col("rank_num") <= 2)
        .select("user_id", "rank_num", "value")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
