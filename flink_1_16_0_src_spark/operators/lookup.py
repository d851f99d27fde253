"""Lookup (dimension) join against external systems.

Reference parity (SURVEY.md §2.4):
- LookupJoinRunner.java:34 — per-row sync probe → here per-BATCH probe
  (Arrow batch = the unit, distinct keys only), with an optional
  per-worker cache (reference: LookupCacheManager / 'lookup.cache').
- AsyncLookupJoinRunner.java — concurrent probes → ``concurrency`` >1
  splits each batch's key set across a thread pool (the Python analog
  of Flink's AsyncWaitOperator ordered mode: results are joined back
  to rows, so output order is deterministic regardless of completion
  order).
- Broadcast fast path: when the dimension fits in memory, skip probing
  entirely and let Spark broadcast-hash-join (see
  queries/joins.py::join_lookup_broadcast).

Scale: network round-trips are per (partition × key-batch), never per
row; the cache bounds repeat probes under key skew; no driver-side
collection anywhere.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

LookupFn = Callable[[list], dict]  # keys -> {key: {col: value}}


@dataclass
class RetryPolicy:
    """Fixed-delay lookup retry — RetryableLookupFunctionDelegator.java:32
    (flink-table/flink-table-runtime/.../join/lookup/) + the
    LookupOptions retry knobs ('lookup.max-retries',
    ResultRetryStrategy.fixedDelayRetry, RetryPredicates.EMPTY_RESULT):

    - ``max_attempts``: total probe attempts per key batch (first call
      included — Flink counts the same way).
    - ``delay``: fixed sleep (seconds) between attempts.
    - ``retry_on_miss``: EMPTY_RESULT_PREDICATE parity — keys that came
      back without a row are re-probed (eventually-consistent stores);
      after exhaustion the miss is TERMINAL: null fields (how='left')
      or row dropped (how='inner'), exactly like the delegator giving
      up after maxRetryTimes.

    Exceptions from the probe count as a failed attempt for every key
    in it; an exception on the LAST attempt propagates (fails the task
    — Spark's task retry takes over, the analog of the job failover the
    reference falls back to)."""

    max_attempts: int = 3
    delay: float = 0.0
    retry_on_miss: bool = False


def _with_retry(lookup_fn: LookupFn, policy: RetryPolicy) -> LookupFn:
    """Wrap a probe fn with the RetryPolicy (the delegator pattern)."""

    def fn(keys: list) -> dict:
        found: dict = {}
        todo = list(keys)
        for attempt in range(1, policy.max_attempts + 1):
            last = attempt == policy.max_attempts
            try:
                res = lookup_fn(todo)
            except Exception:
                if last:
                    raise
                time.sleep(policy.delay)
                continue
            found.update({k: v for k, v in res.items() if v is not None})
            if not policy.retry_on_miss:
                return found
            todo = [k for k in todo if k not in found]
            if not todo or last:
                return found
            time.sleep(policy.delay)
        return found

    return fn


def lookup_join(
    df: DataFrame,
    lookup_fn: LookupFn,
    key_col: str,
    value_fields: list[str],
    output_schema: StructType,
    batch_size: int = 10_000,
    cache: bool = True,
    concurrency: int = 1,
    how: str = "left",
    retry: RetryPolicy | None = None,
) -> DataFrame:
    """Enrich ``df`` with columns from an external keyed store.

    ``lookup_fn(keys)`` is called with ≤ batch_size DISTINCT keys and
    must return {key: {field: value}} (missing keys → null fields, or
    row dropped when how='inner'). ``retry`` wraps every probe with a
    fixed-delay retry (see RetryPolicy) — composes with the cache
    (successful retried hits are cached like any hit; terminal misses
    negative-cache so a flaky store isn't re-hammered per batch) and
    with ``concurrency`` (each chunk retries independently)."""
    probe_fn = _with_retry(lookup_fn, retry) if retry is not None else lookup_fn

    def gen(it: Iterable[pd.DataFrame]):
        local_cache: dict = {}

        def probe(keys: list) -> dict:
            todo = [k for k in keys if not (cache and k in local_cache)]
            found: dict = {}
            if todo:
                chunks = [todo[i : i + batch_size] for i in range(0, len(todo), batch_size)]
                if concurrency > 1 and len(chunks) > 1:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(max_workers=concurrency) as ex:
                        for res in ex.map(probe_fn, chunks):
                            found.update(res)
                else:
                    for ch in chunks:
                        found.update(probe_fn(ch))
            if cache:
                local_cache.update(found)
                for k in todo:
                    local_cache.setdefault(k, None)  # negative-cache misses
                found = {k: local_cache.get(k) for k in keys}
            else:
                for k in keys:
                    found.setdefault(k, None)
            return found

        for pdf in it:
            if not len(pdf):
                continue
            hits = probe(list(pd.unique(pdf[key_col])))
            for f in value_fields:
                pdf[f] = pdf[key_col].map(
                    lambda k: (hits.get(k) or {}).get(f) if hits.get(k) else None
                )
            if how == "inner":
                pdf = pdf[pdf[key_col].map(lambda k: hits.get(k) is not None)]
            yield pdf[[f.name for f in output_schema.fields]]

    return df.mapInPandas(gen, output_schema)
