"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk`` / ``threshold_pairs``: exact cosine; the query
  side is broadcast, the corpus streams — fine up to ~10⁵ queries ×
  any corpus size (work is |Q|·|C|, distributed over corpus
  partitions).
- ``lsh_bucket``: sign-random-projection bucket id (md5-derived
  deterministic hyperplanes, ±1 components). At 100 TB: bucket both
  sides, join on bucket (optionally multi-probe neighboring buckets),
  then exact-rerank — turns O(|Q|·|C|) into O(collisions).

Cosine is accumulated in float64 in deterministic element order so the
DuckDB oracle (DOUBLE[] cosine) matches bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.pipeline.dedup import _cosine


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (excluding self).
    Output: (query_id, neighbor_id, cosine, rank_num)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__cos", _cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank_num", F.row_number().over(w))
        .where(F.col("rank_num") <= k)
        .select("query_id", "neighbor_id", F.round("__cos", 4).alias("cosine"), "rank_num")
    )


def threshold_pairs(
    queries: DataFrame, corpus: DataFrame, vec_col: str, id_col: str, threshold: float
) -> DataFrame:
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__cos", _cosine(F.col("__qv"), F.col("__cv")))
    )
    return scored.where(F.round("__cos", 4) >= threshold).select(
        "query_id", "neighbor_id", F.round("__cos", 4).alias("cosine")
    )


def plane_component(plane: Column | int, dim: Column | int) -> Column:
    """Deterministic ±1 hyperplane component from md5(plane:dim) parity —
    reproducible across engines/runs without shipping a matrix."""
    p = F.lit(plane) if isinstance(plane, int) else plane
    d = F.lit(dim) if isinstance(dim, int) else dim
    h = F.conv(F.substring(F.md5(F.concat_ws(":", p, d)), 1, 15), 16, 10).cast("bigint")
    return (h % 2) * 2 - 1


def lsh_bucket(df: DataFrame, vec_col: str, id_col: str, n_planes: int = 8) -> DataFrame:
    """Sign-random-projection bucket: bit j = (Σ_d v[d]·s(j,d)) ≥ 0,
    bucket = Σ_j bit_j·2^j. One explode of n_planes per row; the dot
    product over ±1 components folds inside aggregate()."""
    dim = F.size(F.col("__v"))
    per_plane = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("plane"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("__v"),
            F.sequence(F.lit(0), dim - 1),
            lambda x, i: x.cast("double") * plane_component(F.col("plane"), i).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # shiftleft needs a literal shift — pow(2, plane) is exact here
    bits = per_plane.select(
        id_col,
        "plane",
        F.when(dot >= 0, F.pow(F.lit(2.0), F.col("plane")).cast("bigint")).otherwise(0).alias(
            "__bit"
        ),
    )
    return bits.groupBy(id_col).agg(F.sum("__bit").cast("int").alias("bucket"))
