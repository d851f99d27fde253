"""Embedding-preprocessing queries — the ops a training/ANN pipeline
runs over an embedding column before indexing or whitening (reference
users do this in user code over DataStream; here they are pure
Catalyst array expressions, map-only, no Python).

Determinism contract (repo float rule): per-row folds run in ascending
dimension order on both engines (F.aggregate left fold == DuckDB
list_sum sequential — the same pairing the kmeans/inertia oracles
already pin); cross-row sums are DECIMAL(25,10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


@query(
    "embed_l2_normalize",
    oracle="""
    SELECT vec_id,
           round(CAST(embedding[1] AS DOUBLE) / sqrt(list_sum(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS u0,
           round(CAST(embedding[2] AS DOUBLE) / sqrt(list_sum(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS u1,
           round(CAST(embedding[3] AS DOUBLE) / sqrt(list_sum(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS u2,
           round(CAST(embedding[4] AS DOUBLE) / sqrt(list_sum(
             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS u3
    FROM embeddings
    """,
    tags=("pipeline", "embedding", "custom-op"),
)
def embed_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalize each embedding (cosine-ready for the ANN/near-dup
    operators); emits the first 4 normalized dims. Map-only: zero
    shuffle, whole-stage codegen array fold per row."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return emb.select(
        "vec_id",
        *[
            F.round(F.element_at(v, d + 1) / norm, 6).alias(f"u{d}")
            for d in range(4)
        ],
    )


@query(
    "embed_dim_stats",
    oracle="""
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / count(*), 4) AS mean0,
           round(CAST(sum(CAST(CAST(embedding[1] AS DOUBLE) * CAST(embedding[1] AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / count(*)
                 - (CAST(sum(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / count(*))
                 * (CAST(sum(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / count(*)), 4) AS var0,
           round(CAST(sum(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / count(*), 4) AS mean1,
           round(CAST(sum(CAST(CAST(embedding[2] AS DOUBLE) * CAST(embedding[2] AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / count(*)
                 - (CAST(sum(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / count(*))
                 * (CAST(sum(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(25,10))) AS DOUBLE) / count(*)), 4) AS var1
    FROM embeddings GROUP BY label
    """,
    tags=("pipeline", "embedding", "custom-op"),
)
def embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean/variance of the first 2 dimensions — the
    per-dimension moments a whitening/PCA pre-pass collects. Cross-row
    first and second moments accumulate in DECIMAL(25,10) (order-
    independent) with ONE double divide each; variance = E[x²]−E[x]²
    on those identical doubles. One k-row shuffle (map-side partials);
    at 100 TB this is the same bounded-stats shape as the kmeans
    update."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")

    def moments(d: int):
        e = F.element_at(v, d + 1)
        s1 = F.sum(e.cast("decimal(25,10)")).cast("double") / F.count(F.lit(1))
        s2 = F.sum((e * e).cast("decimal(25,10)")).cast("double") / F.count(F.lit(1))
        return [
            F.round(s1, 4).alias(f"mean{d}"),
            F.round(s2 - s1 * s1, 4).alias(f"var{d}"),
        ]

    return emb.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"), *(moments(0) + moments(1))
    )
