"""Sampling / balancing / sequence-packing pipeline queries (training-
data curation extras next to dedup/similarity/text) — every decision is
md5-derived, so the DuckDB oracles replay the exact arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load

# DuckDB twin of pipeline.sampling._hash_unit (no salt)
_UNIT = (
    "((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000)"
    " / 1000000.0)"
)
_TOKS = "str_split_regex(lower(trim(text)), '\\s+')"


@query(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {_UNIT} < 0.25
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% Bernoulli sample — md5(id) decides, so the
    same subset survives reruns, repartitions, and engine swaps (a
    rand() sample would not). Map-only: no shuffle."""
    from flink_1_16_0_src_spark.pipeline.sampling import hash_sample

    d = load(spark, sf_dir, "documents")
    return hash_sample(d, "doc_id", 0.25).select("doc_id", "lang")


@query(
    "sample_stratified_cap",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY {_UNIT}, doc_id) AS rn
      FROM documents
    ) WHERE rn <= 40
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def sample_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language balancing: at most 40 docs per lang, chosen by
    deterministic hash order — one shuffle on the stratum key."""
    from flink_1_16_0_src_spark.pipeline.sampling import stratified_cap

    d = load(spark, sf_dir, "documents")
    return stratified_cap(d, "lang", "doc_id", cap=40).select("doc_id", "lang")


@query(
    "sample_train_holdout_split",
    oracle=f"""
    SELECT CAST(count(*) FILTER (WHERE u >= 0.1) AS BIGINT) AS n_train,
           CAST(count(*) FILTER (WHERE u < 0.1) AS BIGINT) AS n_holdout,
           CAST(count(*) AS BIGINT) AS n_total
    FROM (
      SELECT ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 15))::BIGINT
               % 1000000) / 1000000.0) AS u
      FROM documents
    )
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def sample_train_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/holdout split — the same doc lands on
    the same side everywhere (decontamination depends on it); the query
    checks the two sides partition the corpus exactly."""
    from flink_1_16_0_src_spark.pipeline.sampling import split_train_holdout

    d = load(spark, sf_dir, "documents")
    train, hold = split_train_holdout(d, "doc_id", 0.1)
    return (
        train.select(F.lit(1).alias("__o")).groupBy().count()
        .select(F.col("count").alias("n_train"))
        .crossJoin(hold.groupBy().count().select(F.col("count").alias("n_holdout")))
        .crossJoin(d.groupBy().count().select(F.col("count").alias("n_total")))
    )


@query(
    "pack_sequences_bins",
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, len({_TOKS}) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8
                  AS INT) AS bucket
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens, bucket,
             COALESCE(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM staged
    )
    SELECT doc_id, n_tokens, bucket,
           CAST(floor(cb / 2048) AS BIGINT) AS bin_id,
           CAST(cb - floor(cb / 2048) * 2048 AS BIGINT) AS bin_offset
    FROM cum
    """,
    tags=("pipeline", "packing", "custom-op"),
)
def pack_sequences_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: docs → 2048-token context-window bins via
    prefix-sum packing inside 8 hash buckets (bins never cross buckets,
    so parallelism is bucket count at any corpus size). The oracle
    replays the bucket hash, the running sum, and the bin math."""
    from flink_1_16_0_src_spark.pipeline.packing import pack_sequences

    d = load(spark, sf_dir, "documents")
    return pack_sequences(d, "text", "doc_id", budget=2048, n_buckets=8)


@query(
    "pack_bin_fill_stats",
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, len({_TOKS}) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8
                  AS INT) AS bucket
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens, bucket,
             COALESCE(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM staged
    )
    SELECT bucket, CAST(floor(cb / 2048) AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           round(sum(n_tokens) / 2048, 4) AS fill_ratio
    FROM cum GROUP BY bucket, CAST(floor(cb / 2048) AS BIGINT)
    """,
    tags=("pipeline", "packing", "custom-op"),
)
def pack_bin_fill_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin padding-waste report over the packed corpus — the fill
    ratio a training pipeline monitors."""
    from flink_1_16_0_src_spark.pipeline.packing import pack_sequences, packing_stats

    d = load(spark, sf_dir, "documents")
    packed = pack_sequences(d, "text", "doc_id", budget=2048, n_buckets=8)
    return packing_stats(packed, budget=2048)


_GRAMS8 = (
    f"list_distinct(list_transform(generate_series(1, greatest(len({_TOKS}) - 7, 0)),"
    f" i -> array_to_string(({_TOKS})[i:i+7], ' ')))"
)


@query(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT unnest({_GRAMS8}) AS g FROM documents WHERE doc_id % 97 = 0
    ),
    doc_grams AS (
      SELECT doc_id, unnest({_GRAMS8}) AS g FROM documents
    )
    SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_ngrams
    FROM doc_grams d JOIN bench b ON d.g = b.g
    GROUP BY d.doc_id
    """,
    tags=("pipeline", "decontam", "custom-op"),
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/PaLM n-gram overlap rule, n=8
    for the short fixture docs): every doc sharing any 8-gram with the
    'benchmark' subset (doc_id % 97 = 0 stands in for an eval suite) is
    flagged with its distinct-hit count. Benchmark grams broadcast; the
    corpus-side check is one map-side pass."""
    from flink_1_16_0_src_spark.pipeline.decontam import contamination_hits

    d = load(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0)
    return contamination_hits(d, bench, "text", "doc_id", n=8)


@query(
    "decontam_semantic",
    oracle="""
    WITH bench AS (SELECT * FROM embeddings WHERE vec_id % 20 = 0),
    corpus AS (SELECT * FROM embeddings WHERE vec_id % 20 <> 0),
    k AS (SELECT greatest(8, count(*) // 250) AS k FROM bench),
    seed_ids AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cell
      FROM bench, k QUALIFY cell < k.k
    ),
    seeds AS (
      SELECT s.cell, CAST(e.embedding AS DOUBLE[]) AS cvec
      FROM seed_ids s JOIN embeddings e USING (vec_id)
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
      FROM assign a JOIN bench e USING (vec_id)
    ),
    cvec AS (
      SELECT a.vec_id, a.cell, CAST(e.embedding AS DOUBLE[]) AS v
      FROM assign a JOIN corpus e USING (vec_id)
    )
    SELECT c.vec_id, c.cell,
           CAST(count(*) AS BIGINT) AS n_hits,
           max(round(list_cosine_similarity(c.v, b.v), 4)) AS max_cos4
    FROM cvec c JOIN bvec b ON c.cell = b.cell
    WHERE round(list_cosine_similarity(c.v, b.v), 4) >= 0.3
    GROUP BY c.vec_id, c.cell
    """,
    tags=("pipeline", "decontam", "custom-op"),
)
def decontam_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC benchmark decontamination (r12 —
    pipeline.decontam.semantic_contamination): paraphrased eval items
    slip past the 8/13-gram passes, so the embedding tier flags corpus
    vectors whose 4-dp cosine against ANY benchmark vector in the same
    k-means cell reaches 0.3, reporting hit count + max cosine per
    contaminated vector. Every 20th embedding stands in for the eval
    suite; seeds are its k lowest ids (k = max(8, |bench| // 250)).
    The oracle replays assignment (6-dp argmin, lowest-cell tiebreak)
    and the cell-blocked probe; cosines round at 4 dp on both sides."""
    from flink_1_16_0_src_spark.pipeline.decontam import semantic_contamination

    emb = load(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % 20 == 0)
    corpus = emb.where(F.col("vec_id") % 20 != 0)
    k = max(8, bench.count() // 250)
    seed_rows = sorted(
        bench.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    )
    seeds = [list(map(float, r[1])) for r in seed_rows]
    return semantic_contamination(
        corpus, bench, "embedding", "vec_id", seeds, threshold=0.3
    )


@query(
    "decontam_filtered_count",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT unnest({_GRAMS8}) AS g FROM documents WHERE doc_id % 97 = 0
    ),
    doc_grams AS (
      SELECT doc_id, unnest({_GRAMS8}) AS g FROM documents
    ),
    hits AS (
      SELECT DISTINCT d.doc_id FROM doc_grams d JOIN bench b ON d.g = b.g
    )
    SELECT CAST(count(*) AS BIGINT) AS n_clean,
           (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_total
    FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM hits)
    """,
    tags=("pipeline", "decontam", "custom-op"),
)
def decontam_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filtering form: corpus size after dropping every doc with
    any benchmark 8-gram overlap (anti-join against the broadcast flag
    table — corpus text never shuffles)."""
    from flink_1_16_0_src_spark.pipeline.decontam import decontaminate

    d = load(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0)
    clean = decontaminate(d, bench, "text", "doc_id", n=8)
    return (
        clean.groupBy().count().select(F.col("count").alias("n_clean"))
        .crossJoin(d.groupBy().count().select(F.col("count").alias("n_total")))
    )


@query(
    "sample_mixture_weights",
    oracle="""
    WITH w(source, wt) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
    n AS (SELECT source, CAST(count(*) AS DOUBLE) AS n_s FROM documents GROUP BY source),
    c AS (SELECT min(n_s / wt) AS c FROM n JOIN w USING (source) WHERE wt > 0),
    frac AS (
      SELECT n.source, (SELECT c FROM c) * w.wt / n.n_s AS f
      FROM n JOIN w USING (source)
    )
    SELECT d.doc_id, d.source FROM documents d
    JOIN frac ON frac.source = d.source
    WHERE ((('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 15))::BIGINT
            % 1000000) / 1000000.0) < frac.f
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: downsample three sources to a 50/30/20
    target (the binding source keeps everything); every keep-decision
    is md5-derived so the oracle replays the exact fraction arithmetic
    and membership."""
    from flink_1_16_0_src_spark.pipeline.sampling import mix_corpus

    d = load(spark, sf_dir, "documents")
    out = mix_corpus(d, "source", "doc_id", {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    return out.select("doc_id", "source")


@query(
    "sample_source_share",
    oracle="""
    SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST((20000 * count(*) + sum(count(*)) OVER (PARTITION BY source))
                // (2 * sum(count(*)) OVER (PARTITION BY source)) AS BIGINT)
             AS share_e4
    FROM documents GROUP BY source, lang
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def sample_source_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reporting: docs per (source, lang) with each cell's share
    of its source in exact 1e-4 integer units (half-up integer division
    — no float ratio on the hashed surface). The groupBy + window-over-
    aggregate shape is one shuffle on (source, lang) plus a |groups|-row
    window; at 100 TB it is the dashboard a mixture-weighting pass
    (DoReMi-style) reads before reweighting."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    agg = d.groupBy("source", "lang").agg(F.count("*").alias("n_docs"))
    staged = agg.withColumn(
        "__tot", F.sum("n_docs").over(W.partitionBy("source"))
    )
    return staged.select(
        "source", "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.expr("(20000 * n_docs + __tot) div (2 * __tot)")
        .cast("bigint").alias("share_e4"),
    )


@query(
    "shard_assignment",
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, len({_TOKS}) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 15))::BIGINT
                  % 16 AS INT) AS shard
      FROM documents
    )
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM staged GROUP BY shard
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-output sharding: every doc lands in one of 16 shards by
    md5(id:'shard') — deterministic across reruns/engines (a
    rand()-based shard would re-deal on every retry, breaking resumable
    writes), and independent of the sampling/split hashes (different
    salt). The query reports per-shard doc and token counts — the
    balance check run before the sharded write; the write itself is
    repartition(shard).write.partitionBy(shard). One |shards|-row
    shuffle."""
    from flink_1_16_0_src_spark.pipeline.text import tokens

    d = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))), 1, 15),
        16, 10,
    ).cast("bigint")
    staged = d.select(
        (h % 16).cast("int").alias("shard"),
        F.size(tokens("text")).alias("n_tokens"),
    )
    return staged.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


@query(
    "sample_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, (lang = 'en') AS is_target,
             ('0x' || substr(md5(unnest({_TOKS})), 1, 15))::BIGINT % 256 AS f
      FROM documents
    ),
    counts AS (
      SELECT f, count(*) AS cq,
             sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS cp
      FROM toks GROUP BY f
    ),
    totals AS (
      SELECT count(*) AS tq,
             sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tp
      FROM toks
    ),
    ratios AS (
      SELECT f, CAST(round((ln((cp + 1.0) / (tp + 256))
                          - ln((cq + 1.0) / (tq + 256))) * 1e6, 0) AS BIGINT) AS lr
      FROM counts, totals
    )
    SELECT t.doc_id, CAST(sum(r.lr) AS BIGINT) AS dsir_score_e6
    FROM toks t JOIN ratios r USING (f)
    GROUP BY t.doc_id
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-ngram importance weights (Xie et al. 2023): target =
    English documents, features = 256 md5-hashed word unigrams, add-1
    smoothing; per-feature log-ratios quantized to integer micro-nats
    in a broadcast table so the per-doc score is an order-independent
    INTEGER sum (no float summation on the hashed surface)."""
    from flink_1_16_0_src_spark.pipeline.sampling import dsir_logratio_weights

    docs = load(spark, sf_dir, "documents")
    return dsir_logratio_weights(
        docs, "text", "doc_id", target_pred=(F.col("lang") == "en"), n_features=256
    )


@query(
    "sample_temperature_mixture",
    oracle="""
    WITH n AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
    m AS (SELECT min(n_s) AS n_min FROM n),
    frac AS (
      SELECT source, sqrt(CAST((SELECT n_min FROM m) AS DOUBLE) / n_s) AS f
      FROM n
    )
    SELECT d.doc_id, d.source FROM documents d
    JOIN frac ON frac.source = d.source
    WHERE ((('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 15))::BIGINT
            % 1000000) / 1000000.0) < frac.f
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T=2 temperature sampling over sources (pipeline.sampling.
    temperature_mixture): keep fraction (n_min/n_s)^(1/2) per source —
    the mC4/XLM-R flattening rule, downsample-only. sqrt is IEEE
    correctly-rounded on both engines and every keep decision is
    md5-derived, so the oracle replays the exact membership."""
    from flink_1_16_0_src_spark.pipeline.sampling import temperature_mixture

    d = load(spark, sf_dir, "documents")
    return temperature_mixture(d, "source", "doc_id", 2.0).select(
        "doc_id", "source"
    )


@query(
    "sample_epoch_upsampling",
    oracle="""
    WITH marked AS (
      SELECT doc_id, source,
             CASE source
               WHEN 'src0' THEN 2 + CASE WHEN
                 ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch'), 1, 15))::BIGINT
                   % 1000000) / 1000000.0) < 0.25 THEN 1 ELSE 0 END
               WHEN 'src1' THEN 1
               WHEN 'src2' THEN CASE WHEN
                 ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch'), 1, 15))::BIGINT
                   % 1000000) / 1000000.0) < 0.5 THEN 1 ELSE 0 END
               ELSE 0 END AS n
      FROM documents
    )
    SELECT doc_id, source, CAST(unnest(range(1, n + 1)) AS BIGINT) AS epoch
    FROM marked
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def sample_epoch_upsampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch upsampling (pipeline.sampling.epoch_upsample):
    the data-schedule knob training actually turns — src0 repeats 2.25
    epochs, src1 once, src2 half an epoch. floor(e) copies per doc
    plus an md5-decided extra for the fraction; fractions chosen
    binary-exact (0.25, 0.5) so the float literal is identical on both
    engines. Map-only sequence explode; the oracle's generate_series
    replays the schedule row-for-row."""
    from flink_1_16_0_src_spark.pipeline.sampling import epoch_upsample

    d = load(spark, sf_dir, "documents")
    out = epoch_upsample(
        d, "source", "doc_id", {"src0": 2.25, "src1": 1.0, "src2": 0.5}
    )
    return out.select("doc_id", "source", F.col("epoch").cast("bigint").alias("epoch"))


@query(
    "sample_token_budget",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(n_chars % 7 AS BIGINT) AS quality,
             CAST(len(str_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT *, sum(n_tokens) OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id) AS cum
      FROM scored
    )
    SELECT doc_id, source, quality, n_tokens FROM ranked WHERE cum <= 700
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget curation (pipeline.sampling.
    token_budget_select — the 'fill each domain's token budget with its
    best documents' selection every pretraining mixture ends with):
    quality here is a deterministic 7-level score (n_chars % 7, so
    boundary BUCKETS hold several docs and the doc-level boundary rank
    is exercised), tokens are the repo's whitespace count, budget 700
    per source keeps roughly half of each. The op computes the exact
    greedy quality-prefix WITHOUT a corpus-wide per-source sort
    (bucket aggregation + |sources|-row cutoff broadcast + map-only
    filter + boundary-bucket-only rank); the oracle is the equivalent
    window cumsum."""
    from flink_1_16_0_src_spark.pipeline.sampling import token_budget_select
    from flink_1_16_0_src_spark.pipeline.text import token_count

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source",
        (F.col("n_chars") % 7).cast("bigint").alias("quality"),
        token_count("text").cast("bigint").alias("n_tokens"),
    )
    return token_budget_select(
        scored, "source", "quality", "n_tokens", "doc_id", budget=700
    )


@query(
    "sample_curriculum_shards",
    oracle=f"""
    WITH staged AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':curr'), 1, 15))::BIGINT
                  % 8 AS INT) AS shard,
             CAST(len({_TOKS}) AS BIGINT) AS difficulty
      FROM documents
    )
    SELECT shard, doc_id, difficulty,
           CAST(row_number() OVER (PARTITION BY shard
                ORDER BY difficulty, doc_id) AS BIGINT) AS position
    FROM staged
    """,
    tags=("pipeline", "sampling", "curriculum", "custom-op"),
)
def sample_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum shard ordering (pipeline.sampling.curriculum_shards —
    lifted into the library with ``n_shards`` as the scale knob,
    VERDICT r10 next #8): docs land in 8 hash-balanced shards (md5,
    ':curr' salt — independent of the sampling/split/shard hashes),
    then each shard orders by difficulty ASC (token count here; any
    score column works), id tiebreak. Scale: the shuffle is per-shard
    and you size n_shards so each shard fits a task's sort — unlike a
    global difficulty sort, the shard count grows WITH the corpus (the
    same contract as the sharded write it precedes). Integer
    difficulty — engine-exact ordering."""
    from flink_1_16_0_src_spark.pipeline.sampling import curriculum_shards
    from flink_1_16_0_src_spark.pipeline.text import token_count

    d = load(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", token_count("text").cast("bigint").alias("difficulty")
    )
    return curriculum_shards(staged, "doc_id", "difficulty", n_shards=8)


@query(
    "sample_quality_percentiles",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS q
      FROM documents
    )
    SELECT doc_id, source,
           CAST(row_number() OVER (PARTITION BY source ORDER BY q, doc_id)
                * 1000000 // (count(*) OVER (PARTITION BY source))
                AS BIGINT) AS pct_ppm
    FROM scored
    """,
    tags=("pipeline", "sampling", "custom-op"),
)
def sample_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality percentile calibration (pipeline.sampling.
    quality_percentile_by_source — domain scores are only comparable
    after within-domain ranking): rank-ppm of each doc's (quality, id)
    within its source, computed via the bucket-CDF plan (one bucket
    aggregation + a window over the NARROW bucket table + a
    (source, quality)-keyed join — never a per-source global sort).
    Quality = token count here; the oracle is the equivalent window
    formulation."""
    from flink_1_16_0_src_spark.pipeline.sampling import (
        quality_percentile_by_source,
    )
    from flink_1_16_0_src_spark.pipeline.text import token_count

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", token_count("text").cast("bigint").alias("q")
    )
    return quality_percentile_by_source(scored, "source", "q", "doc_id")


@query(
    "decontam_report",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT unnest({_GRAMS8}) AS g FROM documents WHERE doc_id % 97 = 0
    ),
    doc_grams AS (
      SELECT doc_id, unnest({_GRAMS8}) AS g FROM documents
    ),
    hits AS (
      SELECT d.doc_id, CAST(count(*) AS BIGINT) AS nh
      FROM doc_grams d JOIN bench b ON d.g = b.g
      GROUP BY d.doc_id
    )
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(h.nh) AS BIGINT) AS n_contaminated,
           CAST(coalesce(sum(h.nh), 0) AS BIGINT) AS n_hit_grams,
           CAST(count(h.nh) * 1000000 // count(*) AS BIGINT)
             AS contaminated_ppm
    FROM documents s LEFT JOIN hits h USING (doc_id)
    GROUP BY s.source
    """,
    tags=("pipeline", "decontam", "custom-op"),
)
def decontam_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination CENSUS (pipeline.decontam.
    contamination_report — r11): the release-report rollup after the
    n-gram overlap pass — per source: docs, contaminated docs,
    distinct-hit gram total, and contamination parts-per-million
    (integral DIV). Benchmark grams broadcast, hit table joins back on
    the id, one |sources|-row aggregation — the corpus text is scanned
    once and never shuffled."""
    from flink_1_16_0_src_spark.pipeline.decontam import contamination_report

    d = load(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0)
    return contamination_report(d, bench, "text", "doc_id", "source", n=8)
