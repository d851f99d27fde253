"""Flink keyed-state API on Spark's arbitrary-state v2
(`transformWithStateInPandas`, Spark 4.0+).

Reference parity (SURVEY.md §1.1 "Keyed stream + state"):
- `flink-core/.../api/common/state/ValueStateDescriptor.java`,
  `ListStateDescriptor.java`, `MapStateDescriptor.java`,
  `ReducingStateDescriptor.java`, `AggregatingStateDescriptor.java` —
  named, typed per-key state declared up front.
- `StateTtlConfig.java` — per-state TTL; Spark's
  `ttlDurationMs` has the same update-resets-expiry semantics
  (processing-time based, like Flink's default
  `UpdateType.OnCreateAndWrite` + processing-time TTL).
- `KeyedProcessFunction.java:52` processElement with per-key state —
  here the per-key batch handler receives a dict of live state handles.

Design: `StateSpec` mirrors the descriptor classes; `keyed_process`
wraps a user handler into a `StatefulProcessor`. Reducing/aggregating
state are ValueState + a merge function in the adapter, which is
exactly what Flink's heap state backend does under the hood.

Scale: state lives in the executor-local state store (RocksDB at
cluster scale), partitioned by key — the same key-sharded layout as
Flink's keyed state backends. No state crosses the driver.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterable, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


@dataclass
class StateSpec:
    """Descriptor parity (ValueStateDescriptor.java etc.).

    kind: 'value' | 'list' | 'map' | 'reducing' | 'aggregating'
    schema: DDL string for the value ('map' needs key_schema too).
    ttl_ms: StateTtlConfig — update resets expiry (processing time).
    reduce_fn: for 'reducing'/'aggregating' — merge(old, new) -> merged.
    """

    name: str
    kind: str = "value"
    schema: str = "v double"
    key_schema: str = "k string"
    ttl_ms: Optional[int] = None
    reduce_fn: Optional[Callable[[Any, Any], Any]] = None


class _ReducingHandle:
    """ReducingState facade over ValueState (heap-backend equivalence:
    ReducingStateDescriptor wraps a ReduceFunction around stored T)."""

    def __init__(self, inner, reduce_fn):
        self._inner = inner
        self._fn = reduce_fn

    def get(self):
        row = self._inner.get()
        return row[0] if row is not None else None

    def add(self, v):
        cur = self.get()
        self._inner.update((v if cur is None else self._fn(cur, v),))

    def clear(self):
        self._inner.clear()


class _FlinkStyleProcessor(StatefulProcessor):
    def __init__(self, specs, handler, finish=None):
        self._specs = specs
        self._handler = handler
        self._finish = finish

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._states = {}
        for s in self._specs:
            if s.kind == "value":
                self._states[s.name] = handle.getValueState(s.name, s.schema, s.ttl_ms)
            elif s.kind == "list":
                self._states[s.name] = handle.getListState(s.name, s.schema, s.ttl_ms)
            elif s.kind == "map":
                self._states[s.name] = handle.getMapState(
                    s.name, s.key_schema, s.schema, s.ttl_ms
                )
            elif s.kind in ("reducing", "aggregating"):
                inner = handle.getValueState(s.name, s.schema, s.ttl_ms)
                self._states[s.name] = _ReducingHandle(inner, s.reduce_fn)
            else:
                raise ValueError(f"unknown state kind {s.kind!r}")

    def handleInputRows(
        self, key, rows: Iterable[pd.DataFrame], timerValues
    ) -> Iterable[pd.DataFrame]:
        yield from self._handler(key, rows, self._states, timerValues)

    def close(self) -> None:
        pass


def keyed_process(
    sdf: DataFrame,
    keys: list[str],
    specs: list[StateSpec],
    handler: Callable,
    output_schema: str,
    output_mode: str = "Update",
    time_mode: str = "None",
) -> DataFrame:
    """KeyedStream.process with declared state descriptors.
    ``handler(key, pdf_iter, states, timer_values) -> Iterable[pd.DataFrame]``
    — states maps each StateSpec.name to its live handle (ValueState /
    ListState / MapState / ReducingState facade)."""
    return sdf.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=_FlinkStyleProcessor(specs, handler),
        outputStructType=output_schema,
        outputMode=output_mode,
        timeMode=time_mode,
    )
