"""Frequency sketches — heavy hitters over unbounded key domains.

The reference's users build this on keyed ProcessFunction state; the
classic scale problem is that an exact groupBy over a 100 TB key space
(URLs, domains, n-grams) shuffles every distinct key. The two-pass
heavy-hitters design bounds that:

1. Per-partition Misra-Gries summaries (``capacity`` counters each —
   O(capacity) memory regardless of key cardinality) nominate
   candidates. Pigeonhole guarantee: any key whose GLOBAL count
   exceeds (partition rows)/capacity in at least one partition — in
   particular every key with global share > 1/capacity under any data
   placement — survives some partition's summary.
2. An exact recount of the (small) candidate set only: broadcast
   semi-join + groupBy over candidates, then top-k.

Output is therefore EXACT top-k whenever the candidate guarantee holds
(capacity ≫ k; docstring of approx_top_k states the bound) — the
standard two-pass heavy-hitters recipe, with pass 2's shuffle keyed on
candidates instead of the full domain.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _misra_gries_partials(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summary: at most ``capacity`` (key,
    lower-bound-count) rows per partition."""

    def gen(it: Iterable[pd.DataFrame]):
        counters: dict = {}
        for pdf in it:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        if counters:
            yield pd.DataFrame({col: list(counters), "__mg": list(counters.values())})

    from pyspark.sql.types import LongType, StructField, StructType

    field = next(f for f in df.schema.fields if f.name == col)
    schema = StructType([field, StructField("__mg", LongType())])
    return df.select(col).mapInPandas(gen, schema)


def approx_top_k(df: DataFrame, col: str, k: int = 10, capacity: int = 256) -> DataFrame:
    """Exact-when-guaranteed top-k heaviest values of ``col``:
    Misra-Gries candidates per partition, exact recount of candidates,
    rank by (count desc, value). Exactness holds whenever every true
    top-k key has global count > rows_of_some_partition/capacity —
    size ``capacity`` ≫ k (e.g. 100×) for adversarial skew. Output:
    (value_col, cnt, rank_num)."""
    cands = _misra_gries_partials(df, col, capacity).select(col).distinct()
    exact = (
        df.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col(col))
    return (
        exact.withColumn("rank_num", F.row_number().over(w))
        .where(F.col("rank_num") <= k)
    )
