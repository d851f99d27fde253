"""Deduplication pipeline queries (BASELINE.json north-star extras).

The fixture has no natural duplicates, so each query constructs a
deterministic dup-corpus in-query (originals ∪ perturbed copies) on
BOTH sides — the oracle replicates the exact same md5-derived
minhash/simhash arithmetic in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.pipeline.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    simhash,
)
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies (doc_id%5==0, +100000) ∪ near-copies
    with ' zz yy' appended (doc_id%4==0, +200000)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    exact = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang"
    )
    near = d.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz yy")).alias("text"),
        "lang",
    )
    return d.unionByName(exact).unionByName(near)


_DUP_CORPUS_SQL = """
    SELECT doc_id, text, lang FROM documents
    UNION ALL
    SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 200000, text || ' zz yy', lang FROM documents WHERE doc_id % 4 = 0
"""


@query(
    "dedup_exact",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL})
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM corpus
    GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    """,
    tags=("pipeline", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-text fingerprint, keep
    min doc_id (one shuffle; at 100 TB the fingerprint groupBy is the
    canonical first dedup pass)."""
    return exact_dedup(_dup_corpus(spark, sf_dir), "text", "doc_id")


_TOKS = "str_split_regex(lower(trim(text)), '\\s+')"
_SHINGLES = (
    f"list_distinct(list_transform(generate_series(1, greatest(len({_TOKS}) - 2, 0)),"
    f" i -> array_to_string(({_TOKS})[i:i+2], ' ')))"
)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    shingled AS (
      SELECT doc_id, unnest({_SHINGLES}) AS sh FROM corpus
    ),
    base AS (
      SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM shingled
    ),
    hashed AS (
      SELECT b.doc_id, p.perm,
             ((2*p.perm + 1) * (b.h % 2147483647) + p.perm * 40503) % 2147483647 AS h
      FROM base b, generate_series(0, 15) p(perm)
    ),
    sigs AS (
      SELECT doc_id, perm, min(h) AS minhash FROM hashed GROUP BY doc_id, perm
    ),
    banded AS (
      SELECT doc_id, perm // 4 AS band,
             md5(string_agg(minhash::VARCHAR, ',' ORDER BY perm)) AS band_hash
      FROM sigs GROUP BY doc_id, perm // 4
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ),
    sets_ AS (
      -- verify compares 60-bit md5-prefix HASHES of the shingles (the
      -- engine side does the same: long arrays intersect cheaper than
      -- string arrays at scale);
      -- identical arithmetic both sides, so any hash collision is
      -- reproduced bit-for-bit
      SELECT doc_id,
             list_transform({_SHINGLES},
                            sh -> ('0x' || substr(md5(sh), 1, 15))::BIGINT) AS s
      FROM corpus
    )
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(sa.s, sb.s)) /
                 (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4) AS jaccard
    FROM cands c
    JOIN sets_ sa ON sa.doc_id = c.id_a
    JOIN sets_ sb ON sb.doc_id = c.id_b
    WHERE round(len(list_intersect(sa.s, sb.s)) /
          (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4) >= 0.6
    """,
    tags=("pipeline", "dedup", "custom-op"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 perms) + LSH(4 bands × 4 rows) near-dup pairs with
    exact 3-shingle Jaccard verification ≥ 0.6. Everything md5-derived
    → the DuckDB oracle reproduces the pipeline bit-for-bit."""
    return minhash_dedup_pairs(
        _dup_corpus(spark, sf_dir), "text", "doc_id", threshold=0.6, num_perm=16, bands=4, k=3
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    sets_ AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM corpus)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.s, b.s)) /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
    FROM sets_ a JOIN sets_ b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.s, b.s)) /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.5
    """,
    tags=("pipeline", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, blocked by language (the
    blocked-self-join baseline LSH replaces at scale)."""
    from flink_1_16_0_src_spark.pipeline.dedup import shingles

    corpus = _dup_corpus(spark, sf_dir)
    sets_ = corpus.select("doc_id", "lang", shingles("text", 3).alias("s"))
    a = sets_.select(F.col("doc_id").alias("id_a"), "lang", F.col("s").alias("sa"))
    b = sets_.select(F.col("doc_id").alias("id_b"), "lang", F.col("s").alias("sb"))
    joined = a.join(b, "lang").where(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    jac = F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 4)
    return joined.select("id_a", "id_b", jac.alias("jaccard")).where(F.col("jaccard") >= 0.5)


@query(
    "dedup_simhash",
    oracle=f"""
    WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    toks AS (
      SELECT doc_id, ('0x' || substr(md5(unnest({_TOKS})), 1, 15))::BIGINT AS h
      FROM docs
    ),
    votes AS (
      SELECT doc_id, b.bit,
             sum(((h >> b.bit) & 1) * 2 - 1) AS v
      FROM toks, generate_series(0, 31) b(bit)
      GROUP BY doc_id, b.bit
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
    tags=("pipeline", "dedup", "custom-op"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signatures (md5-derived token hashes, bit votes
    weighted by token frequency)."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return simhash(docs, "text", "doc_id", bits=32)


@query(
    "dedup_simhash64_neardup",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    sub AS (SELECT * FROM corpus WHERE doc_id % 100000 < 400),
    toks AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h,
             ('0x' || substr(md5(tok), 16, 15))::BIGINT AS h2
      FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM sub)
    ),
    votes AS (
      SELECT doc_id, b.bit,
             sum((CASE WHEN b.bit < 60 THEN ((h >> b.bit) & 1)
                       ELSE ((h2 >> (b.bit - 60)) & 1) END) * 2 - 1) AS v
      FROM toks, generate_series(0, 63) b(bit)
      GROUP BY doc_id, b.bit
    ),
    sigs AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN
                   CASE WHEN bit = 63
                        THEN (-9223372036854775807 - 1)::HUGEINT
                        ELSE (1::BIGINT << bit)::HUGEINT END
                 ELSE 0::HUGEINT END) AS BIGINT) AS sig
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 8
    """,
    tags=("pipeline", "dedup", "custom-op"),
)
def dedup_simhash64_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL 64-bit SimHash near-dup pairs (r12): the classic 64-bit
    signature whose SIGN bit the pigeonhole band join used to lose
    (ADVICE r11 #1 — arithmetic shiftright gave negative band keys) —
    signatures live as signed BIGINTs, roughly half with the sign bit
    set, and the uncapped band join must equal the all-pairs hamming
    join the oracle computes (xor + bit_count over two's complement on
    both engines). simhash's second md5 limb feeds bits 60-63; bit 63
    contributes the two's-complement sign term."""
    from flink_1_16_0_src_spark.pipeline.dedup import (
        hamming_near_dup_pairs,
        simhash,
    )

    corpus = _dup_corpus(spark, sf_dir).where(
        (F.col("doc_id") % 100000) < 400
    )
    sig = simhash(corpus, "text", "doc_id", bits=64)
    return hamming_near_dup_pairs(
        sig, "doc_id", "simhash", bits=64, max_hamming=8, max_bucket=None
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 4) >= 0.35
    """,
    tags=("pipeline", "dedup"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.35). Unblocked here
    (500-vector fixture); pipeline.dedup.embedding_near_dup_pairs takes
    a block column (LSH bucket) for the 100 TB path."""
    from flink_1_16_0_src_spark.pipeline.dedup import embedding_near_dup_pairs

    emb = load(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, "embedding", "vec_id", threshold=0.35).select(
        "id_a", "id_b", "cosine"
    )


def _ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_16_0_src_spark.pipeline.dedup import shingles

    corpus = _dup_corpus(spark, sf_dir)
    sets_ = corpus.select("doc_id", "lang", shingles("text", 3).alias("s"))
    a = sets_.select(F.col("doc_id").alias("id_a"), "lang", F.col("s").alias("sa"))
    b = sets_.select(F.col("doc_id").alias("id_b"), "lang", F.col("s").alias("sb"))
    joined = a.join(b, "lang").where(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    jac = F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 4)
    return joined.select("id_a", "id_b").where(jac >= 0.5)


_PAIRS_SQL = f"""
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sets_ a JOIN sets_ b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE round(len(list_intersect(a.s, b.s)) /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.5
"""


@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE corpus AS ({_DUP_CORPUS_SQL}),
    sets_ AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM corpus),
    pairs AS ({_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS node, least(src, min(dst)) AS component
    FROM reach GROUP BY src
    """,
    tags=("pipeline", "dedup"),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph (iterative
    min-label propagation, O(diameter) superstep rounds, two shuffles
    per round, localCheckpoint-truncated lineage). The DuckDB oracle
    computes the same labeling by recursive transitive closure —
    feasible only at oracle scale, which is exactly why the
    distributed operator exists."""
    from flink_1_16_0_src_spark.pipeline.dedup import connected_components

    return connected_components(_ngram_pairs(spark, sf_dir)).select("node", "component")


@query(
    "dedup_keep_canonical",
    oracle=f"""
    WITH RECURSIVE corpus AS ({_DUP_CORPUS_SQL}),
    sets_ AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM corpus),
    pairs AS ({_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    losers AS (
      SELECT src AS doc_id FROM reach GROUP BY src
      HAVING least(src, min(dst)) <> src
    )
    SELECT c.doc_id, c.lang FROM corpus c
    WHERE c.doc_id NOT IN (SELECT doc_id FROM losers)
    """,
    tags=("pipeline", "dedup"),
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal dedup step: keep ONE doc (min id) per near-dup
    component, pass through unpaired docs — pairs → components →
    left-anti against the non-canonical set."""
    corpus = _dup_corpus(spark, sf_dir)
    from flink_1_16_0_src_spark.pipeline.dedup import keep_canonical

    return keep_canonical(
        corpus, _ngram_pairs(spark, sf_dir), "doc_id"
    ).select("doc_id", "lang")


@query(
    "sample_split_by_cluster",
    oracle=f"""
    WITH RECURSIVE corpus AS ({_DUP_CORPUS_SQL}),
    sets_ AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM corpus),
    pairs AS ({_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM reach GROUP BY src
    ),
    grp AS (
      SELECT c.doc_id, COALESCE(p.component, c.doc_id) AS grp
      FROM corpus c LEFT JOIN comp p ON p.node = c.doc_id
    )
    SELECT doc_id, grp,
           CASE WHEN (('0x' || substr(md5(CAST(grp AS VARCHAR)
                        || ':split'), 1, 15))::BIGINT
                      % 1000000) / 1000000.0 < 0.1
                THEN 'holdout' ELSE 'train' END AS split
    FROM grp
    """,
    tags=("pipeline", "dedup", "sampling", "custom-op"),
)
def sample_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-AWARE train/holdout split (pipeline.sampling.
    split_by_group): the split key is the near-dup CLUSTER (connected
    component of the n-gram pair graph, unpaired docs their own
    group), so a training doc's near-duplicates can never land in the
    holdout — splitting on raw doc ids leaks them, the classic
    eval-contamination pitfall. Deterministic md5-unit hash on the
    group key, same recipe as sample_train_holdout_split; the oracle
    replays components by recursive closure plus the identical hash."""
    from flink_1_16_0_src_spark.pipeline.dedup import connected_components
    from flink_1_16_0_src_spark.pipeline.sampling import split_by_group

    corpus = _dup_corpus(spark, sf_dir)
    comps = connected_components(_ngram_pairs(spark, sf_dir))
    g = (
        corpus.join(comps, corpus["doc_id"] == comps["node"], "left")
        .select(
            corpus["doc_id"],
            F.coalesce(F.col("component"), corpus["doc_id"]).alias("grp"),
        )
    )
    return split_by_group(g, "grp", 0.1).select("doc_id", "grp", "split")


@query(
    "dedup_substring_spans",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS arr
      FROM documents
    ),
    wins0 AS (
      SELECT doc_id, unnest(generate_series(1, len(arr) - 7)) AS p, arr
      FROM toks WHERE len(arr) >= 8
    ),
    wins AS (
      SELECT doc_id, p - 1 AS pos, array_to_string(arr[p:p+7], ' ') AS gram
      FROM wins0
    ),
    dup AS (
      SELECT gram FROM wins GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (gram)),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
                  THEN 1 ELSE 0 END AS new_island
      FROM hits
    ),
    islands AS (
      SELECT doc_id, pos,
             sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS isl
      FROM flagged
    )
    SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 8 AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS n_windows
    FROM islands GROUP BY doc_id, isl
    """,
    tags=("pipeline", "dedup"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (suffix-array substring dedup
    a la Lee et al. 2021, approximated as duplicated 8-token-window
    islands — pipeline/dedup.duplicate_spans): maximal token ranges
    whose every 8-gram appears in >= 2 distinct documents. One window-
    hash pass (md5 keys, not gram text, on the shuffle), one grouped
    count, one hash join, then per-DOC islands merge (window bounded by
    document length, never corpus-wide)."""
    from flink_1_16_0_src_spark.pipeline.dedup import duplicate_spans

    d = load(spark, sf_dir, "documents")
    return duplicate_spans(d, "text", "doc_id", k=8, min_docs=2).select(
        "doc_id", "span_start", "span_end", "n_windows"
    )


@query(
    "dedup_substring_removed",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS arr
      FROM documents
    ),
    wins0 AS (
      SELECT doc_id, unnest(generate_series(1, len(arr) - 7)) AS p, arr
      FROM toks WHERE len(arr) >= 8
    ),
    wins AS (
      SELECT doc_id, p - 1 AS pos, array_to_string(arr[p:p+7], ' ') AS gram
      FROM wins0
    ),
    dup AS (
      SELECT gram FROM wins GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (gram)),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
                  THEN 1 ELSE 0 END AS new_island
      FROM hits
    ),
    islands AS (
      SELECT doc_id, pos,
             sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS isl
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
      FROM islands GROUP BY doc_id, isl
    ),
    cut AS (
      SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS n_cut FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.arr) AS BIGINT) AS n_tokens_before,
           CAST(len(t.arr) - coalesce(c.n_cut, 0) AS BIGINT) AS n_tokens_after
    FROM toks t LEFT JOIN cut c ON t.doc_id = c.doc_id
    WHERE coalesce(c.n_cut, 0) > 0
    """,
    tags=("pipeline", "dedup"),
)
def dedup_substring_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The destructive half of substring dedup (Lee et al. 2021):
    remove_duplicate_spans cuts every duplicated token range; the query
    reports before/after token counts for every doc that lost tokens —
    driver-checkable evidence that the cut arithmetic (span merge ->
    array filter) is exact. Docs whose cleaned text is empty count 0
    tokens (split('') yields [''] on both engines; guarded)."""
    from flink_1_16_0_src_spark.pipeline.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    spans = duplicate_spans(d, "text", "doc_id", k=8, min_docs=2)
    cleaned = remove_duplicate_spans(d, spans, "text", "doc_id")
    before = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).cast("bigint").alias(
            "n_tokens_before"
        ),
    )
    after = cleaned.select(
        "doc_id",
        F.when(F.col("text") == "", F.lit(0))
        .otherwise(F.size(F.split("text", r"\s+")))
        .cast("bigint")
        .alias("n_tokens_after"),
    )
    return (
        before.join(after, "doc_id")
        .where(F.col("n_tokens_after") < F.col("n_tokens_before"))
        .select("doc_id", "n_tokens_before", "n_tokens_after")
    )


@query(
    "dedup_semantic",
    oracle="""
    WITH k AS (
      -- cluster count scales with the corpus so the mean cluster stays
      -- ~250 vectors (SemDeDup's fixed-cluster-size regime): the
      -- within-cluster pair volume is then LINEAR in N, not N^2/k
      SELECT greatest(8, count(*) // 250) AS k FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings, k WHERE vec_id < k.k
    ),
    dists AS (
      SELECT e.vec_id, s.cell,
             list_sum(list_transform(generate_series(1, len(e.embedding)),
               i -> (CAST(e.embedding[i] AS DOUBLE) - s.cvec[i])
                  * (CAST(e.embedding[i] AS DOUBLE) - s.cvec[i]))) AS d
      FROM embeddings e, seeds s
    ),
    assign AS (
      SELECT vec_id, cell, round(d, 6) AS d FROM (
        SELECT vec_id, cell, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY round(d, 6), cell) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    vecs AS (
      SELECT a.vec_id, a.cell, a.d, CAST(e.embedding AS DOUBLE[]) AS v
      FROM assign a JOIN embeddings e USING (vec_id)
    ),
    drops AS (
      SELECT DISTINCT x.vec_id
      FROM vecs x JOIN vecs y ON x.cell = y.cell AND x.vec_id <> y.vec_id
      WHERE round(list_cosine_similarity(x.v, y.v), 4) >= 0.3
        AND (y.d > x.d OR (y.d = x.d AND y.vec_id < x.vec_id))
    )
    SELECT vec_id, cell FROM vecs
    WHERE vec_id NOT IN (SELECT vec_id FROM drops)
    """,
    tags=("pipeline", "dedup", "custom-op"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means blocking with the cluster
    COUNT scaled to the corpus — k = max(8, N // 250), the paper's
    fixed-mean-cluster-size regime, so the within-cluster pair volume
    is linear in N (a PINNED k makes the operator N^2/k: the r8 scale
    probe measured 57x per decade at k=8 before this change, 5.8x
    after). Deterministic lowest-id seeds (the cluster_kmeans_update
    precedent), within-cluster cosine duplicates at eps=0.3, keep the
    member farthest from its centroid (min-id tiebreak). Oracle
    replays the full pipeline incl. the k rule: assignment argmin at
    6 dp, pair cosine at 4 dp, identical rank rule. The only driver
    coordination is count() + k seed vectors (bounded)."""
    from flink_1_16_0_src_spark.pipeline.dedup import semantic_dedup

    emb = load(spark, sf_dir, "embeddings")
    k = max(8, emb.count() // 250)
    seed_rows = emb.where(F.col("vec_id") < k).select("vec_id", "embedding").collect()
    seeds = [list(map(float, r[1])) for r in sorted(seed_rows, key=lambda r: r[0])]
    return semantic_dedup(emb, "embedding", "vec_id", seeds, threshold=0.3)


@query(
    "dedup_lsh_recall_eval",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    sets_ AS (SELECT doc_id, {_SHINGLES} AS s FROM corpus),
    exact AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sets_ a JOIN sets_ b ON a.doc_id < b.doc_id
      WHERE a.doc_id < 200
        AND round(len(list_intersect(a.s, b.s)) /
              (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) >= 0.6
    ),
    shingled AS (
      SELECT doc_id, unnest({_SHINGLES}) AS sh FROM corpus
    ),
    base AS (
      SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM shingled
    ),
    hashed AS (
      SELECT b.doc_id, p.perm,
             ((2*p.perm + 1) * (b.h % 2147483647) + p.perm * 40503) % 2147483647 AS h
      FROM base b, generate_series(0, 15) p(perm)
    ),
    sigs AS (
      SELECT doc_id, perm, min(h) AS minhash FROM hashed GROUP BY doc_id, perm
    ),
    banded AS (
      SELECT doc_id, perm // 4 AS band,
             md5(string_agg(minhash::VARCHAR, ',' ORDER BY perm)) AS band_hash
      FROM sigs GROUP BY doc_id, perm // 4
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
      WHERE a.doc_id < 200
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
           (SELECT CAST(count(*) AS BIGINT) FROM cands) AS n_candidates,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(count(*) * 10000 // greatest((SELECT count(*) FROM exact), 1)
                AS BIGINT) AS recall_e4
    FROM exact e JOIN cands c ON e.id_a = c.id_a AND e.id_b = c.id_b
    """,
    tags=("pipeline", "dedup", "eval", "custom-op"),
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-recall harness for the banded MinHash join (the
    dedup-side twin of sim_ann_recall_eval): exact ground truth =
    all Jaccard >= 0.6 pairs anchored at doc_id < 200 (the probe set —
    brute force is the small-probe exact tool; ground truth at 100 TB
    comes from a labeled sample, never corpus all-pairs), candidates =
    the same 16-perm/4-band LSH the production pipeline runs. Recall
    reported in exact integer e4 (floor), so the hashed surface never
    holds a float ratio."""
    from flink_1_16_0_src_spark.pipeline.dedup import (
        lsh_candidate_pairs, minhash_signatures, shingles,
    )

    corpus = _dup_corpus(spark, sf_dir)
    sets_ = corpus.select("doc_id", shingles("text", 3).alias("s"))
    a = sets_.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sets_.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    jac = F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 4)
    exact = (
        a.where(F.col("id_a") < 200)
        .crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .where(jac >= 0.6)
        .select("id_a", "id_b")
    )
    sigs = minhash_signatures(corpus, "text", "doc_id", num_perm=16, k=3)
    cands = lsh_candidate_pairs(sigs, "doc_id", num_perm=16, bands=4).where(
        F.col("id_a") < 200
    )
    hits = exact.join(cands, ["id_a", "id_b"])
    n_exact = exact.count()
    n_cands = cands.count()
    n_hits = hits.count()
    return spark.createDataFrame(
        [(n_exact, n_cands, n_hits, n_hits * 10000 // max(n_exact, 1))],
        "n_exact bigint, n_candidates bigint, n_hits bigint, recall_e4 bigint",
    )


@query(
    "dedup_incremental_minhash",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    shingled AS (
      SELECT doc_id, unnest({_SHINGLES}) AS sh FROM corpus
    ),
    base AS (
      SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM shingled
    ),
    hashed AS (
      SELECT b.doc_id, p.perm,
             ((2*p.perm + 1) * (b.h % 2147483647) + p.perm * 40503) % 2147483647 AS h
      FROM base b, generate_series(0, 15) p(perm)
    ),
    sigs AS (
      SELECT doc_id, perm, min(h) AS minhash FROM hashed GROUP BY doc_id, perm
    ),
    banded AS (
      SELECT doc_id, perm // 4 AS band,
             md5(string_agg(minhash::VARCHAR, ',' ORDER BY perm)) AS band_hash
      FROM sigs GROUP BY doc_id, perm // 4
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_hash = b.band_hash
      WHERE a.doc_id < 100000 AND b.doc_id >= 100000
    ),
    sets_ AS (
      SELECT doc_id,
             list_transform({_SHINGLES},
                            sh -> ('0x' || substr(md5(sh), 1, 15))::BIGINT) AS s
      FROM corpus
    )
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(sa.s, sb.s)) /
                 (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4) AS jaccard
    FROM cands c
    JOIN sets_ sa ON sa.doc_id = c.id_a
    JOIN sets_ sb ON sb.doc_id = c.id_b
    WHERE round(len(list_intersect(sa.s, sb.s)) /
          (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 4) >= 0.6
    """,
    tags=("pipeline", "dedup", "custom-op"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl-vs-index dedup (pipeline.dedup.
    minhash_dedup_against): the planted copies (doc_id >= 100000) are
    the NEW shard, the originals the BASE index — candidates are
    strictly base x new buckets (no self-join quadratic term), verify
    is the same exact-Jaccard pass, every hash md5-derived so the
    oracle replays the pipeline bit-for-bit."""
    from flink_1_16_0_src_spark.pipeline.dedup import minhash_dedup_against

    corpus = _dup_corpus(spark, sf_dir)
    base = corpus.where(F.col("doc_id") < 100000)
    new = corpus.where(F.col("doc_id") >= 100000)
    return minhash_dedup_against(
        new, base, "text", "doc_id", threshold=0.6, num_perm=16, bands=4, k=3
    )


@query(
    "dedup_incremental_semantic",
    oracle="""
    WITH nb AS (SELECT count(*) // 2 AS b FROM embeddings),
    base AS (SELECT * FROM embeddings, nb WHERE vec_id < nb.b),
    new_ AS (SELECT * FROM embeddings, nb WHERE vec_id >= nb.b),
    k AS (SELECT greatest(8, count(*) // 250) AS k FROM base),
    seeds AS (
      SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cvec
      FROM base, k WHERE vec_id < k.k
    ),
    dists AS (
      SELECT e.vec_id, s.cell,
             list_sum(list_transform(generate_series(1, len(e.embedding)),
               i -> (CAST(e.embedding[i] AS DOUBLE) - s.cvec[i])
                  * (CAST(e.embedding[i] AS DOUBLE) - s.cvec[i]))) AS d
      FROM embeddings e, seeds s
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY round(d, 6), cell) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    bvec AS (
      SELECT a.vec_id, a.cell, CAST(e.embedding AS DOUBLE[]) AS v
      FROM assign a JOIN base e USING (vec_id)
    ),
    nvec AS (
      SELECT a.vec_id, a.cell, CAST(e.embedding AS DOUBLE[]) AS v
      FROM assign a JOIN new_ e USING (vec_id)
    ),
    drops AS (
      SELECT DISTINCT n.vec_id
      FROM nvec n JOIN bvec b ON n.cell = b.cell
      WHERE round(list_cosine_similarity(n.v, b.v), 4) >= 0.3
    )
    SELECT vec_id, cell FROM nvec
    WHERE vec_id NOT IN (SELECT vec_id FROM drops)
    """,
    tags=("pipeline", "dedup", "custom-op"),
)
def dedup_incremental_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup (pipeline.dedup.semantic_dedup_against —
    r11, the EMBEDDING tier completing the crawl-vs-index family):
    the upper half of the embeddings table is the NEW snapshot, the
    lower half the BASE index; seeds derive from the BASE (k = max(8,
    |base| // 250), lowest-id rule), candidates are strictly base x
    new within a k-means cell with hot-cell salting, cosine
    thresholded at 4 dp. Survivors of the new shard return with their
    cell; the oracle replays assignment (6-dp argmin, lowest-cell
    tiebreak) and the cell-blocked probe."""
    from flink_1_16_0_src_spark.pipeline.dedup import semantic_dedup_against

    emb = load(spark, sf_dir, "embeddings")
    b = emb.count() // 2
    base = emb.where(F.col("vec_id") < b)
    new = emb.where(F.col("vec_id") >= b)
    k = max(8, base.count() // 250)
    seed_rows = base.where(F.col("vec_id") < k).select(
        "vec_id", "embedding"
    ).collect()
    seeds = [list(map(float, r[1])) for r in sorted(seed_rows, key=lambda r: r[0])]
    return semantic_dedup_against(
        new, base, "embedding", "vec_id", seeds, threshold=0.3
    )


@query(
    "dedup_incremental_exact",
    oracle=f"""
    WITH corpus AS ({_DUP_CORPUS_SQL}),
    base_fp AS (
      SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM corpus WHERE doc_id < 100000
    )
    SELECT n.doc_id, n.lang FROM corpus n
    WHERE n.doc_id >= 100000
      AND md5(regexp_replace(lower(trim(n.text)), '\\s+', ' ', 'g')) NOT IN
          (SELECT fp FROM base_fp)
    """,
    tags=("pipeline", "dedup", "custom-op"),
)
def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-match tier of incremental ingestion (pipeline.dedup.
    exact_dedup_against): the planted copies are the new shard — exact
    copies (+100000) anti-join away against the base fingerprint set,
    the ' zz yy' near-copies (+200000) survive for the MinHash tier."""
    from flink_1_16_0_src_spark.pipeline.dedup import exact_dedup_against

    corpus = _dup_corpus(spark, sf_dir)
    base = corpus.where(F.col("doc_id") < 100000)
    new = corpus.where(F.col("doc_id") >= 100000)
    return exact_dedup_against(new, base, "text", "doc_id").select("doc_id", "lang")


@query(
    "dedup_incremental_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             ('0x' || substr(md5(unnest({_TOKS})), 1, 15))::BIGINT AS h
      FROM documents
    ),
    votes AS (
      SELECT doc_id, b.bit, sum(((h >> b.bit) & 1) * 2 - 1) AS v
      FROM toks, generate_series(0, 31) b(bit) GROUP BY doc_id, b.bit
    ),
    sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)
                  AS BIGINT) AS s
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b
      ON a.doc_id < 250 AND b.doc_id >= 250
     AND bit_count(xor(a.s, b.s)) <= 2
    """,
    tags=("pipeline", "dedup", "incremental", "custom-op"),
)
def dedup_incremental_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SimHash tier of crawl-vs-index dedup
    (pipeline.dedup.simhash_dedup_against): 32-bit signatures, pairs
    within hamming distance 2 of the base found via the PIGEONHOLE band
    join (3 contiguous bands — a pair differing in <= 2 bits must agree
    exactly on one band), verified with bit_count(xor). With no
    hot-bucket cap the banded result EQUALS the full hamming join (no
    recall loss, unlike MinHash banding), which is exactly what the
    oracle computes as an unblocked base x new theta join."""
    from flink_1_16_0_src_spark.pipeline.dedup import simhash_dedup_against

    docs = load(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 250)
    new = docs.where(F.col("doc_id") >= 250)
    return simhash_dedup_against(
        new, base, "text", "doc_id", bits=32, max_hamming=2, max_bucket=None
    )


@query(
    "dedup_prefix",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 200000 AS doc_id,
             array_to_string(list_slice(
               str_split_regex(lower(trim(text)), '\s+'), 1, 30), ' ') AS text
      FROM documents
    ),
    fp AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(
               str_split_regex(lower(trim(text)), '\s+'), 1, 20), ' ')) AS pfp,
             CAST(len(text) AS BIGINT) AS l
      FROM corpus
    ),
    keep AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY pfp ORDER BY l DESC, doc_id)
                 AS rn
        FROM fp
      ) WHERE rn = 1
    )
    SELECT f.doc_id, f.l AS len_chars FROM fp f
    WHERE f.doc_id IN (SELECT doc_id FROM keep)
    """,
    tags=("pipeline", "dedup", "custom-op"),
)
def dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-duplicate removal (pipeline.dedup.prefix_dedup —
    r11): every document gets a planted TRUNCATED copy (its first 30
    normalized tokens, doc_id + 200000); deduping on the 20-token
    prefix fingerprint collapses each (original, truncation) pair to
    the LONGEST member (min-id tiebreak) — the head-of-doc hash
    catches what whole-document fingerprints miss. One hash-groupBy
    on the 16-byte fingerprint, keep rule as a max_by aggregate (no
    window sort); the oracle replays the same prefix hash and keep
    rank."""
    from flink_1_16_0_src_spark.pipeline.dedup import prefix_dedup
    from flink_1_16_0_src_spark.pipeline.text import tokens

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    truncated = docs.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.array_join(F.slice(tokens("text"), 1, 30), " ").alias("text"),
    )
    corpus = docs.unionByName(truncated)
    return prefix_dedup(corpus, "text", "doc_id", n_tokens=20).select(
        "doc_id", F.length("text").cast("bigint").alias("len_chars")
    )


@query(
    "dedup_cluster_census",
    oracle=f"""
    WITH RECURSIVE corpus AS ({_DUP_CORPUS_SQL}),
    sets_ AS (SELECT doc_id, lang, {_SHINGLES} AS s FROM corpus),
    pairs AS ({_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
      SELECT src AS node, least(src, min(dst)) AS component
      FROM reach GROUP BY src
    ),
    sizes AS (
      SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY component
    )
    SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
    tags=("pipeline", "dedup", "custom-op"),
)
def dedup_cluster_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size census (pipeline.dedup.cluster_census —
    r11): the dedup-report rollup over the connected-components
    labeling of the near-dup pair graph — clusters and docs per
    cluster size (a fat tail flags boilerplate/mirror domains). Two
    narrow aggregations over the label table; the oracle extends the
    recursive-closure components oracle with the same census."""
    from flink_1_16_0_src_spark.pipeline.dedup import (
        cluster_census,
        connected_components,
    )

    return cluster_census(connected_components(_ngram_pairs(spark, sf_dir)))
