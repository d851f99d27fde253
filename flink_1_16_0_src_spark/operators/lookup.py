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

from typing import Callable, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

LookupFn = Callable[[list], dict]  # keys -> {key: {col: value}}


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
) -> DataFrame:
    """Enrich ``df`` with columns from an external keyed store.

    ``lookup_fn(keys)`` is called with ≤ batch_size DISTINCT keys and
    must return {key: {field: value}} (missing keys → null fields, or
    row dropped when how='inner').
    """

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
                        for res in ex.map(lookup_fn, chunks):
                            found.update(res)
                else:
                    for ch in chunks:
                        found.update(lookup_fn(ch))
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
