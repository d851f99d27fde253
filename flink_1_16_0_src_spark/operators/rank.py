"""Rank / Top-N / deduplicate operators (SURVEY.md §2.6).

Reference parity:
- batch rank: EXEC-B/BatchExecRank.java:46, RankOperator.java:33 —
  row_number + filter (Spark 3.5 pushes this into WindowGroupLimitExec,
  so the per-partition top-k never materializes the full sort).
- stream Top-N strategies (AppendOnlyTopNFunction.java:248 etc.) — the
  batch API here; the streaming variant lives in streaming/stateful.py.
- deduplicate keep-first/keep-last: EXEC-S/StreamExecDeduplicate.java:85,
  T-RUNTIME/operators/deduplicate/.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[Column],
    n: int,
    rank_function: str = "row_number",
    output_rank_as: str | None = "rank_num",
) -> DataFrame:
    """Top-N per group. ``rank_function``: row_number | rank | dense_rank
    (Flink RankType). Catalyst rewrites window+filter(rn<=k) into a
    group-limit that keeps only k rows per partition before the final
    sort — scale-safe for 100 TB (no full per-group materialization)."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[rank_function]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("__rank", fn().over(w)).where(F.col("__rank") <= n)
    if output_rank_as:
        return ranked.withColumnRenamed("__rank", output_rank_as)
    return ranked.drop("__rank")


def deduplicate(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    keep: str = "first",
) -> DataFrame:
    """Keep first/last row per key by event-time order (reference
    ProcTimeDeduplicateKeepLastRowFunction.java:32,
    RowTimeDeduplicateFunction.java). keep='first' orders ascending,
    'last' flips to descending — both are row_number()=1, one shuffle."""
    if keep == "last":
        order_by = [c.desc() if isinstance(c, Column) else F.col(c).desc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
