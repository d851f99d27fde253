"""Late-data side output + count windows / evictors
(SURVEY.md §2.9 triggers/evictors/late-data row).

The LateRowRouter is a foreachBatch function — driven here with
scripted micro-batches (the OneInputStreamOperatorTestHarness pattern:
feed batches, assert routed output), then the count window drains a
real file stream.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_1_16_0_src_spark import tables
from flink_1_16_0_src_spark.streaming import sources
from flink_1_16_0_src_spark.streaming.late import (
    LateRowRouter,
    _evict,
    streaming_count_window,
)

SF_DIR = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_late_router_scripted_batches(spark):
    got_time, got_late = [], []
    router = LateRowRouter(
        "ts",
        dt.timedelta(minutes=10),
        lambda df, bid: got_time.extend(r.ts for r in df.collect()),
        lambda df, bid: got_late.extend(r.ts for r in df.collect()),
    )

    def batch(*ts):
        return spark.createDataFrame([(t,) for t in map(_ts, ts)], "ts timestamp")

    # batch 0: no watermark yet — everything on time; advances wm to 12:50
    router(batch("2024-01-01 12:30:00", "2024-01-01 13:00:00"), 0)
    # batch 1: wm=12:50 — 12:40 is late, 12:55 on time; wm → 13:20
    router(batch("2024-01-01 12:40:00", "2024-01-01 12:55:00",
                 "2024-01-01 13:30:00"), 1)
    # batch 2: wm=13:20 — 13:00 late, 13:25 on time
    router(batch("2024-01-01 13:00:00", "2024-01-01 13:25:00"), 2)

    assert [t.isoformat(" ") for t in got_late] == [
        "2024-01-01 12:40:00",
        "2024-01-01 13:00:00",
    ]
    assert len(got_time) == 5
    # watermark never regresses: a batch with only old rows leaves it
    router(batch("2024-01-01 12:00:00"), 3)
    assert got_late[-1].isoformat(" ") == "2024-01-01 12:00:00"
    assert router.watermark == _ts("2024-01-01 13:20:00")


def test_evictors():
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 12:00", "2024-01-01 12:20", "2024-01-01 12:40"]
            ),
            "v": [1.0, 2.0, 3.0],
        }
    )
    assert list(_evict(pdf, ("count", 2), None)["v"]) == [2.0, 3.0]
    assert list(_evict(pdf, ("time", pd.Timedelta(minutes=25)), "ts")["v"]) == [2.0, 3.0]
    assert list(_evict(pdf, None, None)["v"]) == [1.0, 2.0, 3.0]


def test_streaming_count_window_matches_batch(spark):
    sdf = sources.stream_table(spark, SF_DIR, "events")
    out = streaming_count_window(
        sdf.select("user_id", "ts", "value"),
        ["user_id"],
        5,
        lambda w: {"n": len(w), "total": round(float(w["value"].sum()), 4)},
        "user_id long, n long, total double",
    )
    got = sources.run_to_memory(out, "t_countwin", "append")
    # every fired window has exactly 5 rows; per key, fired count =
    # floor(rows/5) (tail stays in state)
    ev = tables.load(spark, SF_DIR, "events")
    expected = (
        ev.groupBy("user_id").count().select("user_id", (F.floor(F.col("count") / 5)).alias("k"))
    )
    exp = {r.user_id: r.k for r in expected.collect() if r.k > 0}
    rows = got.collect()
    assert all(r.n == 5 for r in rows)
    fired = {}
    for r in rows:
        fired[r.user_id] = fired.get(r.user_id, 0) + 1
    assert fired == exp


def test_streaming_count_window_with_evictor(spark):
    sdf = sources.stream_table(spark, SF_DIR, "events")
    out = streaming_count_window(
        sdf.select("user_id", "ts", "value"),
        ["user_id"],
        4,
        lambda w: {"n": len(w)},
        "user_id long, n long",
        evictor=("count", 2),
    )
    got = sources.run_to_memory(out, "t_countwin_ev", "append")
    rows = got.collect()
    assert len(rows) > 0 and all(r.n == 2 for r in rows)  # evicted to last 2


def test_temporal_sort_watermark_ordered_emission(spark, tmp_path):
    """RowTimeSortOperator parity: out-of-order rows re-ordered before
    release; rows newer than the watermark held in state."""
    import os
    import time as _time

    rdir = str(tmp_path / "ts")
    os.makedirs(rdir)
    pd.DataFrame(
        {
            "uid": [1, 1, 1],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 10:30", "2024-01-01 10:05"]
            ),
        }
    ).to_parquet(os.path.join(rdir, "a.parquet"), coerce_timestamps="us")
    _time.sleep(1.1)
    pd.DataFrame(
        {
            "uid": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 10:20", "2024-01-01 11:00"]),
        }
    ).to_parquet(os.path.join(rdir, "b.parquet"), coerce_timestamps="us")

    from flink_1_16_0_src_spark.streaming.dedup import temporal_sort

    sdf = (
        spark.readStream.schema(spark.read.parquet(rdir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rdir)
    )
    out = temporal_sort(sdf, "ts", "20 minutes", ["uid"])
    got = sources.run_to_memory(out, "t_temporal_sort", "append")
    emitted = [r.ts.isoformat(" ") for r in got.collect()]
    # batch1 wm=10:10 → 10:00,10:05 out (sorted); batch2 wm=10:40 →
    # 10:20,10:30 out (the late 10:20 re-ordered before 10:30);
    # 11:00 still buffered when the drain ends
    assert sorted(emitted) == [
        "2024-01-01 10:00:00",
        "2024-01-01 10:05:00",
        "2024-01-01 10:20:00",
        "2024-01-01 10:30:00",
    ]


def test_streaming_delta_trigger_window(spark, tmp_path):
    """DeltaTrigger analog vs a plain-Python simulation of
    DeltaTrigger.java semantics (fire when delta(anchor, cur) >
    threshold, triggering row included, anchor replaced), with state
    carried across multiple micro-batches (maxFilesPerTrigger=1)."""
    from flink_1_16_0_src_spark.streaming.late import streaming_delta_trigger_window

    rows = [
        ("k1", i, float(v))
        for i, v in enumerate([0, 1, 3, 9, 10, 11, 20, 21, 35, 36, 37])
    ] + [("k2", i, float(v)) for i, v in enumerate([5, 100, 101, 300])]
    d = str(tmp_path / "delta_src")
    # three seq-ranged files written sequentially → three micro-batches
    # in seq order; order_col handles intra-batch arrival order
    df = spark.createDataFrame(rows, "k string, seq long, v double")
    for lo, hi in ((0, 4), (4, 8), (8, 100)):
        df.where((F.col("seq") >= lo) & (F.col("seq") < hi)).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    sdf = (
        spark.readStream.schema("k string, seq long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = streaming_delta_trigger_window(
        sdf,
        ["k"],
        lambda a, c: abs(c["v"] - a["v"]),
        6.0,
        lambda w: {"n": len(w), "last_v": float(w["v"].iloc[-1])},
        "k string, n long, last_v double",
        order_col="seq",
    )
    got = sources.run_to_memory(out, "t_delta", "append")
    fired = sorted((r.k, r.n, r.last_v) for r in got.collect())

    # plain-Python DeltaTrigger simulation per key over seq order —
    # batch boundaries don't matter because anchor+buffer are state
    def sim(vals):
        res, buf, anchor = [], [], None
        for v in vals:
            buf.append(v)
            if anchor is None:
                anchor = v
            elif abs(v - anchor) > 6.0:
                res.append((len(buf), v))
                buf, anchor = [], v
        return res

    exp = []
    for k, vals in (("k1", [0, 1, 3, 9, 10, 11, 20, 21, 35, 36, 37]), ("k2", [5, 100, 101, 300])):
        exp += [(k, n, v) for n, v in sim(vals)]
    assert fired == sorted(exp)


def test_continuous_event_time_fire_slices(spark):
    """ContinuousEventTimeTrigger analog: the is_final slices equal the
    TUMBLE result; every firing boundary is an interval multiple inside
    its window; counts are non-decreasing across a window's firings."""
    from flink_1_16_0_src_spark.streaming.late import continuous_event_time_fire

    ev = tables.load(spark, SF_DIR, "events").select("ts", "event_type", "value")
    fired = continuous_event_time_fire(
        ev, "ts", "1 hour", "15 minutes", ["event_type"],
        F.count("*").alias("n"),
    ).collect()
    finals = {(r.window_start, r.event_type): r.n for r in fired if r.is_final}
    tumble = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    exp = {(r.w.start, r.event_type): r.n for r in tumble}
    assert finals == exp
    # non-final firings never exceed their window's final count
    for r in fired:
        if not r.is_final:
            assert r.n <= finals[(r.window_start, r.event_type)]
