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
           CAST(CAST(sum(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(25,10))) AS DECIMAL(25,10)) AS VARCHAR) AS s0,
           CAST(CAST(sum(CAST(CAST(embedding[1] AS DOUBLE) * CAST(embedding[1] AS DOUBLE) AS DECIMAL(25,10))) AS DECIMAL(25,10)) AS VARCHAR) AS ss0,
           CAST(CAST(sum(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(25,10))) AS DECIMAL(25,10)) AS VARCHAR) AS s1,
           CAST(CAST(sum(CAST(CAST(embedding[2] AS DOUBLE) * CAST(embedding[2] AS DOUBLE) AS DECIMAL(25,10))) AS DECIMAL(25,10)) AS VARCHAR) AS ss1
    FROM embeddings GROUP BY label
    """,
    tags=("pipeline", "embedding", "custom-op"),
)
def embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label first/second moments of the first 2 dimensions in
    sufficient-statistic form ``(n, Σx, Σx²)`` — exactly what a
    distributed whitening/PCA pre-pass shuffles and merges (mean and
    variance are the consumer's one division each). Accumulation is
    DECIMAL(25,10) (order-independent) emitted as strings, so the
    hashed surface has no double divide / round(double) — the same
    engine-exact-by-construction contract as cluster_kmeans_update
    (the round(decimal→double / count) shape is a cross-engine
    boundary lottery; see VERDICT r3 §What's wrong #1). One k-row
    shuffle (map-side partials)."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")

    def moments(d: int):
        e = F.element_at(v, d + 1)
        return [
            F.sum(e.cast("decimal(25,10)")).cast("decimal(25,10)")
            .cast("string").alias(f"s{d}"),
            F.sum((e * e).cast("decimal(25,10)")).cast("decimal(25,10)")
            .cast("string").alias(f"ss{d}"),
        ]

    return emb.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"), *(moments(0) + moments(1))
    )


@query(
    "embed_int8_quantize",
    oracle="""
    WITH stats AS (
      SELECT d,
             min(CAST(embedding[d] AS DOUBLE)) AS mn,
             max(CAST(embedding[d] AS DOUBLE)) AS mx
      FROM embeddings, generate_series(1, 64) t(d)
      GROUP BY d
    ),
    codes AS (
      SELECT e.vec_id, s.d,
             CASE WHEN s.mx = s.mn THEN 0
                  ELSE CAST(round((CAST(e.embedding[s.d] AS DOUBLE) - s.mn)
                                  / ((s.mx - s.mn) / 255.0), 0) AS INT)
             END AS code
      FROM embeddings e JOIN stats s ON TRUE
    )
    SELECT vec_id, string_agg(code::VARCHAR, ',' ORDER BY d) AS codes_csv
    FROM codes GROUP BY vec_id
    """,
    tags=("pipeline", "embedding", "custom-op"),
)
def embed_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar uint8 quantization of the embedding column (the vector-
    store ingestion step: per-dimension min/max range mapped to 0..255
    codes — the FAISS ScalarQuantizer QT_8bit recipe). One corpus pass
    computes the 2×64-value stats row (bounded, broadcast); the encode
    pass is map-only (zip_with over two literal-size arrays, no
    shuffle). Codes emitted as a CSV string so the hashed surface is
    pure integers; the only float op per code is one divide + round,
    identical IEEE doubles on both engines."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    dim = 64
    stats = emb.agg(
        F.array(*[F.min(F.element_at(v, d + 1)) for d in range(dim)]).alias("__mn"),
        F.array(*[F.max(F.element_at(v, d + 1)) for d in range(dim)]).alias("__mx"),
    )
    quant = emb.crossJoin(F.broadcast(stats))
    code = F.zip_with(
        v,
        F.zip_with("__mn", "__mx", lambda mn, mx: F.struct(mn.alias("mn"), mx.alias("mx"))),
        lambda x, s: F.when(s.mx == s.mn, F.lit(0)).otherwise(
            F.round((x - s.mn) / ((s.mx - s.mn) / 255.0), 0).cast("int")
        ),
    )
    return quant.select(
        "vec_id", F.array_join(code, ",").alias("codes_csv")
    )


@query(
    "embed_random_projection",
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> ((('0x' || substr(md5('0:' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2) * 2 - 1)
                  * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS p0,
           CAST(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> ((('0x' || substr(md5('1:' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2) * 2 - 1)
                  * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS p1,
           CAST(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> ((('0x' || substr(md5('2:' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2) * 2 - 1)
                  * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS p2,
           CAST(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> ((('0x' || substr(md5('3:' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2) * 2 - 1)
                  * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS p3,
           CAST(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> ((('0x' || substr(md5('4:' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2) * 2 - 1)
                  * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS p4,
           CAST(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> ((('0x' || substr(md5('5:' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2) * 2 - 1)
                  * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS p5,
           CAST(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> ((('0x' || substr(md5('6:' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2) * 2 - 1)
                  * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS p6,
           CAST(list_sum(list_transform(range(1, len(embedding) + 1),
             i -> ((('0x' || substr(md5('7:' || CAST(i - 1 AS VARCHAR)), 1, 15))::BIGINT % 2) * 2 - 1)
                  * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT) AS p7
    FROM embeddings
    """,
    tags=("pipeline", "embedding", "custom-op"),
)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL +-1 random projection to 8 dims (pipeline.similarity.
    random_projection): md5-parity sign matrix, inputs quantized to
    floor(x*1e6) micro-units so every output coordinate is an exact
    integer sum — numpy's batched int64 matmul and the oracle's
    sequential list fold agree bit-for-bit (a float dot product would
    not). Map-only Arrow stage, no shuffle."""
    from flink_1_16_0_src_spark.pipeline.similarity import random_projection

    e = load(spark, sf_dir, "embeddings")
    return random_projection(e, "embedding", "vec_id", k=8)


@query(
    "embed_matryoshka_truncate",
    oracle="""
    WITH t AS (
      SELECT vec_id,
             list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    SELECT vec_id,
           round(v[1] / sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS u0,
           round(v[2] / sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS u1,
           round(v[3] / sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS u2,
           round(v[16] / sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS u15
    FROM t
    """,
    tags=("pipeline", "embedding", "custom-op"),
)
def embed_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation (Kusupati et al. 2022, "Matryoshka
    Representation Learning"): keep the LEADING 16 of 64 dims and
    L2-renormalize — the progressive-retrieval trick (cheap coarse ANN
    over the prefix, full-dim re-rank on the shortlist) modern
    embedding models are trained for. Map-only Catalyst array slice +
    fold, zero shuffle, no Python; emits dims 0-2 and 15 of the
    renormalized prefix. The per-row fold runs in ascending dimension
    order on both engines (the embed_l2_normalize determinism
    contract)."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.slice(F.col("embedding").cast("array<double>"), 1, 16)
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return emb.select(
        "vec_id",
        *[
            F.round(F.element_at(v, d + 1) / norm, 6).alias(f"u{d}")
            for d in (0, 1, 2, 15)
        ],
    )
