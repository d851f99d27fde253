"""Flink keyed-state API parity on arbitrary-state v2
(transformWithStateInPandas): Value/List/Map/Reducing state descriptors,
cross-micro-batch persistence (SURVEY.md §1.1 keyed state row)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_1_16_0_src_spark import tables
from flink_1_16_0_src_spark.streaming.state_v2 import StateSpec, keyed_process

SF_DIR = "/root/testdata/sf0.001"

# transformWithStateInPandas needs protobuf at runtime (state-server
# protocol). Same gating policy as avro: the adapter is complete, the
# execution tests run wherever the dependency exists.
try:
    import google.protobuf  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

needs_protobuf = pytest.mark.skipif(
    not _HAS_PROTOBUF, reason="transformWithStateInPandas requires protobuf"
)


@pytest.fixture(scope="module")
def multi_batch_events(spark, tmp_path_factory):
    """events split into 4 files → 4 micro-batches with maxFilesPerTrigger=1,
    so state MUST survive across batches for totals to be right."""
    d = str(tmp_path_factory.mktemp("tws") / "events4")
    ev = tables.load(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    ev.repartition(4).write.parquet(d)
    return d


def _stream(spark, path):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    schema = "event_id bigint, user_id bigint, value double"
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )


@needs_protobuf
def test_running_sum_count_across_batches(spark, multi_batch_events, tmp_path):
    sdf = _stream(spark, multi_batch_events)

    specs = [
        StateSpec("total", kind="reducing", schema="v double", reduce_fn=lambda a, b: a + b),
        StateSpec("cnt", kind="value", schema="c bigint"),
    ]

    def handler(key, pdfs, states, timers):
        n, s = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        states["total"].add(s)
        prev = states["cnt"].get()
        cnt = (prev[0] if prev is not None else 0) + n
        states["cnt"].update((cnt,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total": [states["total"].get()], "cnt": [cnt]}
        )

    out = keyed_process(
        sdf, ["user_id"], specs, handler,
        "user_id bigint, total double, cnt bigint",
    )
    q = (
        out.writeStream.format("memory").queryName("tws_sum")
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    # update mode emits once per key per batch → keep the LAST emission per key
    res = spark.sql(
        "SELECT user_id, total, cnt FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC) rn"
        "  FROM tws_sum) WHERE rn = 1"
    ).toPandas()
    exp = (
        tables.load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count("*").alias("cnt"))
        .toPandas()
    )
    got = {int(r.user_id): (round(r.total, 6), int(r.cnt)) for r in res.itertuples()}
    want = {int(r.user_id): (round(r.total, 6), int(r.cnt)) for r in exp.itertuples()}
    assert got == want and len(got) > 0


@needs_protobuf
def test_map_state_distinct_tracking(spark, multi_batch_events, tmp_path):
    """MapStateDescriptor parity: per-key map tracks seen value-buckets
    across batches; final distinct-bucket count matches batch."""
    sdf = _stream(spark, multi_batch_events)

    specs = [StateSpec("seen", kind="map", key_schema="b bigint", schema="one int")]

    def handler(key, pdfs, states, timers):
        seen = states["seen"]
        for pdf in pdfs:
            for b in (pdf["event_id"] % 10).unique():
                seen.updateValue((int(b),), (1,))
        n = sum(1 for _ in seen.keys())
        yield pd.DataFrame({"user_id": [key[0]], "n_buckets": [n]})

    out = keyed_process(
        sdf, ["user_id"], specs, handler, "user_id bigint, n_buckets bigint"
    )
    q = (
        out.writeStream.format("memory").queryName("tws_map")
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination()
    res = spark.sql(
        "SELECT user_id, max(n_buckets) AS n_buckets FROM tws_map GROUP BY user_id"
    ).toPandas()
    exp = (
        tables.load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.countDistinct(F.col("event_id") % 10).alias("n_buckets"))
        .toPandas()
    )
    got = {int(r.user_id): int(r.n_buckets) for r in res.itertuples()}
    want = {int(r.user_id): int(r.n_buckets) for r in exp.itertuples()}
    assert got == want and len(got) > 0


def test_adapter_wiring_without_runtime():
    """No-protobuf check: descriptors map to the right handle getters;
    ReducingState facade folds with the user's reduce_fn."""
    from flink_1_16_0_src_spark.streaming.state_v2 import (
        _FlinkStyleProcessor,
        _ReducingHandle,
    )

    calls = []

    class FakeValue:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, t):
            self.v = t

        def clear(self):
            self.v = None

    class FakeHandle:
        def getValueState(self, name, schema, ttl=None):
            calls.append(("value", name, ttl))
            return FakeValue()

        def getListState(self, name, schema, ttl=None):
            calls.append(("list", name, ttl))
            return FakeValue()

        def getMapState(self, name, ks, vs, ttl=None):
            calls.append(("map", name, ttl))
            return FakeValue()

    specs = [
        StateSpec("a", kind="value", schema="v double", ttl_ms=60000),
        StateSpec("b", kind="list", schema="v double"),
        StateSpec("c", kind="map", key_schema="k string", schema="v int"),
        StateSpec("d", kind="reducing", schema="v double", reduce_fn=lambda x, y: x + y),
    ]
    proc = _FlinkStyleProcessor(specs, handler=None)
    proc.init(FakeHandle())
    assert calls == [
        ("value", "a", 60000),
        ("list", "b", None),
        ("map", "c", None),
        ("value", "d", None),
    ]
    red = proc._states["d"]
    assert isinstance(red, _ReducingHandle)
    red.add(1.5)
    red.add(2.5)
    assert red.get() == 4.0
    red.clear()
    assert red.get() is None


# ---- Non-gated adapter tests (VERDICT r1 item 9) --------------------------
#
# transformWithStateInPandas needs protobuf to EXECUTE, but the adapter
# logic — descriptor wiring, the ReducingState facade's merge semantics,
# handler dispatch — is plain Python. A fake StatefulProcessorHandle
# with dict-backed state exercises it without the state server, so the
# adapter is tested even where the two execution tests above skip.


class _FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.calls = []

    def getValueState(self, name, schema, ttl_ms=None):
        self.calls.append(("value", name, schema, ttl_ms))
        return _FakeValueState()

    def getListState(self, name, schema, ttl_ms=None):
        self.calls.append(("list", name, schema, ttl_ms))
        return []

    def getMapState(self, name, key_schema, schema, ttl_ms=None):
        self.calls.append(("map", name, key_schema, schema, ttl_ms))
        return {}


def test_reducing_handle_merge_semantics():
    from flink_1_16_0_src_spark.streaming.state_v2 import _ReducingHandle

    h = _ReducingHandle(_FakeValueState(), lambda a, b: a + b)
    assert h.get() is None
    h.add(3.0)          # first add: stored as-is (ReduceFunction not called)
    assert h.get() == 3.0
    h.add(4.5)          # subsequent adds merge through reduce_fn
    h.add(2.5)
    assert h.get() == 10.0
    h.clear()
    assert h.get() is None
    # non-commutative fn: argument order is (current, new) — Flink's
    # ReduceFunction.reduce(value1=state, value2=input) contract
    h2 = _ReducingHandle(_FakeValueState(), lambda a, b: f"{a}|{b}")
    h2.add("x"); h2.add("y"); h2.add("z")
    assert h2.get() == "x|y|z"


def test_processor_descriptor_wiring_and_dispatch():
    from flink_1_16_0_src_spark.streaming.state_v2 import (
        StateSpec,
        _FlinkStyleProcessor,
        _ReducingHandle,
    )

    seen = []

    def handler(key, rows, states, timer_values):
        seen.append((key, sorted(states)))
        states["total"].add(7.0)
        yield pd.DataFrame({"k": [key[0]], "v": [states["total"].get()]})

    specs = [
        StateSpec("total", kind="reducing", schema="v double", reduce_fn=lambda a, b: a + b),
        StateSpec("cnt", kind="value", schema="c bigint", ttl_ms=60000),
        StateSpec("log", kind="list", schema="e bigint"),
        StateSpec("m", kind="map", schema="v double", key_schema="k string"),
    ]
    proc = _FlinkStyleProcessor(specs, handler)
    fh = _FakeHandle()
    proc.init(fh)
    # each descriptor kind resolves to the matching handle getter, TTL
    # passed through (StateTtlConfig parity)
    assert ("value", "cnt", "c bigint", 60000) in fh.calls
    assert ("value", "total", "v double", None) in fh.calls  # reducing = value + fn
    assert ("list", "log", "e bigint", None) in fh.calls
    assert ("map", "m", "k string", "v double", None) in fh.calls
    assert isinstance(proc._states["total"], _ReducingHandle)

    out = list(proc.handleInputRows(("u1",), iter([pd.DataFrame({"value": [1.0]})]), None))
    out += list(proc.handleInputRows(("u1",), iter([pd.DataFrame({"value": [2.0]})]), None))
    assert seen == [(("u1",), ["cnt", "log", "m", "total"]), (("u1",), ["cnt", "log", "m", "total"])]
    # reducing state accumulated across calls: 7 then 14
    assert [df["v"].iloc[0] for df in out] == [7.0, 14.0]

    with pytest.raises(ValueError):
        _FlinkStyleProcessor([StateSpec("bad", kind="nope")], handler).init(_FakeHandle())
