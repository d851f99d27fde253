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


def test_streaming_window_topn_order_col_in_payload(spark):
    """ADVICE r11 #4: order_col doubling as a payload column must yield
    a duplicate-free output StructType (a repeated field name breaks
    applyInPandasWithState output resolution)."""
    from flink_1_16_0_src_spark.streaming import sources, windows

    sdf = sources.stream_table(spark, SF_DIR, "events", watermark=("ts", "10 minutes"))
    out = windows.window_topn(
        sdf, "ts", "1 hour", ["event_type"], "value", 2,
        payload=["value", "event_id"],
    )
    names = [f.name for f in out.schema.fields]
    assert names.count("value") == 1 and len(names) == len(set(names))
    got = sources.run_to_memory(out, "w_topn_dup_payload", "append")
    assert got.count() > 0


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


def test_window_topn_state_bounded_at_k():
    """The window Top-N buffer never holds more than k rows
    (WindowRankProcessor.java:191-197 TopNBuffer parity — VERDICT r10
    #3): the merge helper the stateful operator uses is rank-bounded,
    ties break by payload columns under the same total order as the
    (order, payload) tuple compare, and NULL order values rank LAST
    under DESC (ADVICE r10 #3)."""
    import pandas as pd

    from flink_1_16_0_src_spark.streaming.windows import _topk_merge

    buf = pd.DataFrame(
        {"v": [5.0, None, 3.0, 9.0, 9.0, 1.0, None],
         "eid": [1, 2, 3, 4, 5, 6, 7]}
    )
    top = _topk_merge(buf, ["v", "eid"], 3, descending=True)
    assert len(top) == 3  # k-bounded, not O(rows)
    # 9.0 tie breaks by eid DESC (tuple-compare order); NULLs never
    # outrank non-null values
    assert list(top["eid"]) == [5, 4, 1]
    # fewer than k non-null: NULLs fill the tail (NULLS LAST), still <= k
    top2 = _topk_merge(buf, ["v", "eid"], 6, descending=True)
    assert list(top2["eid"]) == [5, 4, 1, 3, 6, 7] and top2["v"].isna().sum() == 1
    # ASC: nulls first (Spark ORDER BY default), k-bounded
    top3 = _topk_merge(buf, ["v", "eid"], 2, descending=False)
    assert len(top3) == 2 and list(top3["eid"]) == [2, 7]


def test_streaming_window_topn_cross_batch(spark, tmp_path):
    """Window Top-N stays exact when a window's rows SPAN micro-batches
    (the k-bounded buffer merges per batch) and late rows into a
    closed window drop (VERDICT r10 #3 done-criterion)."""
    import datetime as dt
    import glob
    import os
    import shutil

    from flink_1_16_0_src_spark.streaming import sources, windows

    src = str(tmp_path / "wtnsrc")
    os.makedirs(src)
    mk = lambda rows: spark.createDataFrame(
        rows, "eid bigint, ts timestamp, k string, v double")

    def one_file(df, name, mtime):
        tmp = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, name)
        shutil.move(part, dst)
        os.utime(dst, (mtime, mtime))

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    # batch 1: three 10:00-window rows for key a + an 11:05 row that
    # advances the watermark past nothing yet (wm = 11:04)
    one_file(mk([(1, t0, "a", 5.0),
                 (2, dt.datetime(2024, 1, 1, 10, 10), "a", 7.0),
                 (3, dt.datetime(2024, 1, 1, 10, 20), "a", 6.0),
                 (4, dt.datetime(2024, 1, 1, 11, 5), "a", 1.0)]),
             "f1.parquet", 1_000_000)
    # batch 2: a BETTER 10:00-window row arrives while the window is
    # still open (wm was 11:04 > 11:00? no: 11:04 >= 11:00 → closed!)
    # → the 10:00 window closed at end of batch 1; eid=5 is late and
    # drops. The 11:00 window gets eid=6 and closes at wm 12:29.
    one_file(mk([(5, dt.datetime(2024, 1, 1, 10, 30), "a", 9.0),
                 (6, dt.datetime(2024, 1, 1, 11, 10), "a", 2.0),
                 (7, dt.datetime(2024, 1, 1, 12, 30), "a", 0.5)]),
             "f2.parquet", 2_000_000)
    sdf = (
        spark.readStream.schema(mk([]).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 minute")
    )
    out = windows.window_topn(sdf, "ts", "1 hour", ["k"], "v", 2, ["eid"])
    got = sorted(
        (r.window_end.hour, r.rank_num, r.eid, r.v)
        for r in sources.run_to_memory(out, "wtn_xbatch", "append").collect()
    )
    # 10:00 window: top-2 of batch-1 rows only (late eid=5 dropped);
    # 11:00 window: eids 4 and 6 merged ACROSS batches; 12:00 open
    assert got == [
        (11, 1, 2, 7.0), (11, 2, 3, 6.0),
        (12, 1, 6, 2.0), (12, 2, 4, 1.0),
    ]
