"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design (the 100 TB contract):
- exact dedup = hash-groupBy on a fingerprint — one shuffle;
- MinHash-LSH = signature computation is explode+groupBy (linear in
  corpus tokens), candidate generation joins on (band, band_hash) —
  only near-identical docs collide, so the join output is ~linear;
- SimHash = 64-bit signature via per-token bit votes, bucket join on
  signature prefix;
- NEVER an unblocked O(n²) self-join; the exact-Jaccard verifier runs
  only on LSH/blocking candidates.

All hashes are md5-derived for engine-independent determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.pipeline.text import fingerprint


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id document per exact (normalized) text
    fingerprint."""
    return (
        df.withColumn("__fp", fingerprint(text_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .drop("__fp")
    )


def shingles(text_col: str, k: int = 3):
    """k-word shingles of lowercased text (distinct). Guarded for
    docs shorter than k tokens: Spark's sequence(1, 0) is DESCENDING
    [1,0] (not empty like DuckDB's generate_series), so short docs
    must short-circuit to an empty array."""
    toks = f"split(lower(trim({text_col})), '\\\\s+')"
    return F.array_distinct(
        F.expr(
            f"CASE WHEN size({toks}) >= {k} THEN "
            f"transform(sequence(1, size({toks}) - {k - 1}),"
            f" i -> concat_ws(' ', slice({toks}, i, {k}))) "
            f"ELSE cast(array() as array<string>) END"
        )
    )


_MERSENNE31 = 2_147_483_647  # 2^31-1, the classic minhash modulus


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_perm: int = 16, k: int = 3
) -> DataFrame:
    """(id, perm, minhash): ONE md5 per shingle (60-bit base hash h),
    then ``num_perm`` affine permutations h_p = ((2p+1)·(h mod M) +
    40503p) mod M over the Mersenne prime M=2^31-1 — the standard
    universal-hashing MinHash construction. 16× cheaper than hashing
    per (perm, shingle); work is linear in corpus tokens, folded by a
    partial-aggregating groupBy."""
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, k)).alias("__sh")).select(
        id_col,
        F.conv(F.substring(F.md5(F.col("__sh")), 1, 15), 16, 10).cast("bigint").alias("__h"),
    )
    perms = sh.select(
        id_col, "__h", F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("perm")
    )
    hp = (
        (2 * F.col("perm") + 1) * (F.col("__h") % _MERSENNE31) + F.col("perm") * 40503
    ) % _MERSENNE31
    return (
        perms.select(id_col, "perm", hp.alias("__hp"))
        .groupBy(id_col, "perm")
        .agg(F.min("__hp").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_perm: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature (rows_per_band = num_perm/bands), hash each
    band, join docs sharing any (band, band_hash). Returns distinct
    (id_a < id_b) candidate pairs."""
    rows_per_band = num_perm // bands
    banded = (
        signatures.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
                        lambda x: x["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("band_hash")
        )
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    k: int = 3,
) -> DataFrame:
    """Exact k-shingle Jaccard on candidate pairs only."""
    sets_ = df.select(F.col(id_col), shingles(text_col, k).alias("__set"))
    a = sets_.select(F.col(id_col).alias("id_a"), F.col("__set").alias("__set_a"))
    b = sets_.select(F.col(id_col).alias("id_b"), F.col("__set").alias("__set_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("__set_a", "__set_b"))
    union = F.size(F.array_union("__set_a", "__set_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return joined.select(
        "id_a", "id_b", F.round(jac, 4).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidate
    join → exact-Jaccard verification.

    The entry repartition spreads the shingle/permutation fan-out over
    the cluster — small corpora otherwise ride a single input split
    through the whole pipeline (one task doing all the hashing); at
    scale the same shuffle co-locates docs by id ahead of the per-doc
    groupBys."""
    # explicit partition count: AQE would coalesce a by-size repartition
    # of the (small, pre-explode) doc rows down to one task, serializing
    # the ~|tokens|×num_perm hash fan-out that follows
    n = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(n, F.col(id_col))
    sigs = minhash_signatures(df, text_col, id_col, num_perm, k)
    cands = lsh_candidate_pairs(sigs, id_col, num_perm, bands)
    return jaccard_verify(df, cands, text_col, id_col, threshold, k)


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """SimHash signature: per-token md5-derived ``bits``-bit hash; each
    bit position votes +1/-1 weighted by token frequency; sign of the
    vote is the signature bit. Explode factor = tokens × bits (bounded;
    use bits=32 at scale, 64 doubles the fan-out)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__tok"),
    )
    tok_h = toks.select(
        id_col,
        F.conv(F.substring(F.md5(F.col("__tok")), 1, 15), 16, 10).cast("bigint").alias("__h"),
    )
    # shiftleft/shiftright take literal shift amounts only — use exact
    # pow(2, bit) arithmetic instead (exact for bit <= 52 in float64)
    pow2 = F.pow(F.lit(2.0), F.col("bit")).cast("bigint")
    bit = tok_h.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        F.col("__h"),
    ).select(
        id_col,
        "bit",
        ((F.expr("__h div cast(pow(2.0, bit) as bigint)") % 2) * 2 - 1).alias("vote"),
    )
    votes = bit.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(F.when(F.col("v") > 0, pow2).otherwise(F.lit(0).cast("bigint"))).alias("simhash")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs. With ``block_col`` the self-join
    is restricted to equal blocks (LSH bucket / cluster id / shard key)
    — at 100 TB pass a bucket column from similarity.lsh_bucket, never
    run unblocked."""
    cols = [F.col(id_col), F.col(vec_col)] + ([F.col(block_col)] if block_col else [])
    base = df.select(*cols)
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        *([F.col(block_col).alias("__blk")] if block_col else []),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        *([F.col(block_col).alias("__blk")] if block_col else []),
    )
    on = ["__blk"] if block_col else None
    joined = a.join(b, on) if on else a.crossJoin(b)
    joined = joined.where(F.col("id_a") < F.col("id_b"))
    cos = _cosine(F.col("__va"), F.col("__vb"))
    return joined.select("id_a", "id_b", F.round(cos, 4).alias("cosine")).where(
        F.col("cosine") >= threshold
    )


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return dot / (na * nb)
