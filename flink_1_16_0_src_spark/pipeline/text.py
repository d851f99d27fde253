"""Text analysis operators: tokenization, language-ID heuristic,
quality scoring, fingerprinting.

All pure pyspark.sql.functions compositions (whole-stage codegen'd,
zero Python in the hot path). Each mirrors a standard LLM-data-prep
step (C4/Gopher-style quality signals from published pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
# (public, standard function-word sets)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "es": ["el", "la", "de", "y", "es", "en", "un"],
    "de": ["der", "die", "das", "und", "ist", "in", "ein"],
    "fr": ["le", "la", "de", "et", "est", "en", "un"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token-count estimate: chars/4 plus one per word boundary
    (the published ~4-chars-per-token heuristic)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) / 4).cast("bigint") + token_count(c)


def stopword_hits(col: Column | str, lang: str) -> Column:
    toks = tokens(col)
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, arr))


def language_id(col: Column | str) -> Column:
    """Stopword-overlap language heuristic: argmax of per-language
    stopword hit counts, 'und' (undetermined) when all zero."""
    hits = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    # when-chain in sorted order: first matching lang wins ties
    chain = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        chain = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(chain)
    return chain


def quality_signals(col: Column | str) -> dict[str, Column]:
    """Gopher/C4-style quality signals (ratios in [0,1], rounded by the
    caller): token count, mean token length, unique-token ratio,
    stopword ratio, alpha-char ratio."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n = F.size(toks)
    return {
        "n_tokens": n.cast("bigint"),
        "mean_tok_len": F.when(n > 0, F.length(F.concat_ws("", toks)) / n).otherwise(F.lit(0.0)),
        "uniq_ratio": F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n > 0, stopword_hits(c, "en") / n).otherwise(F.lit(0.0)),
        "alpha_ratio": F.when(
            F.length(c) > 0,
            F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / F.length(c),
        ).otherwise(F.lit(0.0)),
    }


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text
    (exact-dup key)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def bag_fingerprint(col: Column | str) -> Column:
    """Order-insensitive fingerprint: md5 over the sorted distinct token
    bag — catches token-shuffled duplicates."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


PII_PATTERNS = (
    # (regex, replacement) — applied in order, all JVM-side regexp_replace
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\+?1[-. ]?)?(?:\(\d{3}\)|\d{3})[-. ]?\d{3}[-. ]?\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def pii_scrub(col: Column | str) -> Column:
    """PII redaction — email / NANP phone / IPv4 / SSN patterns replaced
    with typed placeholders. Pure chained ``regexp_replace`` (JVM
    regex, whole-stage codegen) — no Python in the hot path, so the
    scrub runs at full scan speed over a 100 TB corpus."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


# Corpus-adapted function-word list for the Gopher "contains >= 2 stop
# words" rule (Rae et al. 2021, Appendix A uses the/be/to/of/and/that/
# have/with; the synthetic fixture's vocabulary only carries the first
# two kinds, so the en function-word set keeps the rule binding).
GOPHER_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def gopher_signals(col: Column | str) -> dict[str, Column]:
    """Gopher quality-rule signals (Rae et al. 2021, Appendix A —
    public): word count, summed word chars (for mean word length),
    alphabetic-word count, symbol-word count (# / ellipsis), distinct
    function-word hits. All Spark array built-ins + higher-order
    ``filter`` — whole-stage codegen'd, zero Python per row, so the
    panel runs at scan speed over a 100 TB corpus. Rule thresholds are
    applied by the caller as EXACT integer cross-multiplications
    (``10*n_alpha >= 8*n_words`` instead of ``n_alpha/n_words >= 0.8``)
    so the pass flags never touch a float."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    return {
        "n_words": F.size(toks).cast("bigint"),
        "sum_wchars": F.length(F.concat_ws("", toks)).cast("bigint"),
        "n_alpha_words": F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("bigint"),
        "n_symbol_words": F.size(
            F.filter(toks, lambda w: (w == "#") | (w == "…"))
        ).cast("bigint"),
        "stop_hits": F.size(F.array_intersect(toks, stop_arr)).cast("bigint"),
    }


def gopher_gate(
    col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> Column:
    """The composed Gopher quality gate as ONE boolean Column with the
    token array bound once via a transform() lambda variable (the
    shingles()/hash_lm_ppl_micro idiom). Composing the gate from the
    five independent ``gopher_signals`` Columns re-evaluated the
    tokenizer ~11x per row: higher-order functions put the whole
    predicate on the interpreted path (no whole-stage codegen, no
    common-subexpression elimination), and ``sum_wchars BETWEEN
    3*n_words AND 10*n_words`` alone expands to four copies of the
    split() subtree. Binding the rules inside a single lambda keeps the
    expression self-contained, so Catalyst's filter pushdown cannot
    re-duplicate it either (projecting a signal struct and filtering on
    its fields gets collapsed back into N inlined copies — measured 25
    split() sites in the e2e plan under that shape). Thresholds mirror
    gopher_signals' integer cross-multiplication rules exactly."""
    toks = f"split(lower(trim({col})), '\\\\s+')"
    stops = ",".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return F.expr(
        f"transform(array({toks}), t -> "
        f"size(t) between {min_words} and {max_words} "
        f"and length(concat_ws('', t)) between 3 * size(t) and 10 * size(t) "
        f"and 10 * size(filter(t, w -> w = '#' or w = '…')) <= size(t) "
        f"and 10 * size(filter(t, w -> w rlike '[a-z]')) >= 8 * size(t) "
        f"and size(array_intersect(t, array({stops}))) >= 2"
        f")[0]"
    )


def gopher_signals_struct(col: str) -> Column:
    """The five ``gopher_signals`` fields fused into ONE struct Column
    with the token array bound once (the shingles() idiom): project
    this struct in its own select, then extract fields in a SECOND
    select — one tokenizer pass per row instead of one per signal.
    Catalyst's Project-Project collapse keeps the alias because the
    struct is non-cheap and referenced repeatedly (verified: 1 split()
    site in the collapsed plan). Do NOT filter directly on the fields
    of the projected struct — filter pushdown substitutes the alias
    and re-duplicates the whole expression per reference; use
    ``gopher_gate`` for predicates."""
    toks = f"split(lower(trim({col})), '\\\\s+')"
    stops = ",".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return F.expr(
        f"transform(array({toks}), t -> named_struct("
        f"'n_words', cast(size(t) as bigint), "
        f"'sum_wchars', cast(length(concat_ws('', t)) as bigint), "
        f"'n_alpha_words', cast(size(filter(t, w -> w rlike '[a-z]')) as bigint), "
        f"'n_symbol_words', cast(size(filter(t, w -> w = '#' or w = '…')) as bigint), "
        f"'stop_hits', cast(size(array_intersect(t, array({stops}))) as bigint)"
        f"))[0]"
    )


def c4_line_stats(lines: Column) -> dict[str, Column]:
    """C4 line/page filters (Raffel et al. 2020, §2.2 — public): keep
    only lines that end in a terminal punctuation mark AND contain at
    least 5 words; page-level drops for '{', 'lorem ipsum', and fewer
    than 3 sentences. Input is an array-of-lines column; outputs are
    exact counts/flags plus the retained text, all via higher-order
    array functions (no explode — the per-doc line array stays inside
    one row, so the pass is map-only at any corpus size)."""
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]$') & (F.size(F.split(l, " ")) >= 5),
    )
    doc = F.array_join(lines, "\n")
    return {
        "n_lines": F.size(lines).cast("bigint"),
        "n_kept_lines": F.size(kept).cast("bigint"),
        "kept_text": F.array_join(kept, "\n"),
        "n_sentences": F.length(F.regexp_replace(doc, "[^.!?]", "")).cast("bigint"),
        "has_brace": F.when(doc.contains("{"), F.lit(1)).otherwise(F.lit(0)).cast("int"),
        "has_lorem": F.when(doc.contains("lorem ipsum"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int"),
    }


def repetition_signals(col: Column | str) -> dict[str, Column]:
    """Within-document repetition (Gopher-style quality filters):
    ``dup_word_frac`` = 1 - distinct/total words. The companion
    top-bigram fraction is relational (explode + count) — see the
    ``text_repetition`` query. All array ops are Spark built-ins."""
    c = F.col(col) if isinstance(col, str) else col
    w = F.split(c, " ")
    return {
        "n_words": F.size(w).cast("bigint"),
        "dup_word_frac": F.round(
            1.0 - F.size(F.array_distinct(w)).cast("double") / F.size(w), 4
        ),
    }


def boilerplate_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int = 5, min_docs: int = 3
) -> DataFrame:
    """Cross-document boilerplate detection: word n-grams appearing in
    at least ``min_docs`` DISTINCT documents (headers, footers, nav
    text, license blurbs — the repeated substrings Lee et al.'s
    dedup paper targets at the corpus level). One explode + one
    groupBy on the gram — count(distinct doc) folds map-side; at
    100 TB the gram key space is huge but uniform (no hot keys by
    construction). Output: (ngram, doc_freq)."""
    from flink_1_16_0_src_spark.pipeline.dedup import shingles

    grams = df.select(F.col(id_col), F.explode(shingles(text_col, n)).alias("ngram"))
    return (
        grams.groupBy("ngram")
        .agg(F.countDistinct(id_col).alias("doc_freq"))
        .where(F.col("doc_freq") >= min_docs)
    )


def hash_lm_ppl_micro(text_col: str) -> Column:
    """CCNet-style language-model perplexity proxy (Wenzek et al. 2019
    §4.3: per-paragraph KenLM perplexity drives head/middle/tail
    quality bucketing). The container has no KenLM, so the bigram
    "log-probability" is a DETERMINISTIC HASH-LM STUB — each bigram
    costs (md5-hash mod 6e6) + 5e5 negative micro-nats — with the
    Spark-side plumbing (tokenize → bigram fold → integer mean) real:
    swapping in a real LM is replacing this expression with a broadcast
    logprob-table join, the same shape DSIR already uses. Returns the
    per-doc mean bigram cost in positive micro-nats as an exact BIGINT
    (integer division), NULL-free for docs with >= 2 tokens.

    Map-only: one interpreted aggregate() fold per doc, no shuffle —
    at 100 TB this is a scan-shaped pass like the Gopher gates.

    The token array is BOUND ONCE per doc via a transform() lambda
    variable (interpreted HOFs get no CSE for repeated non-attribute
    subtrees — inlining the split into the bigram slice re-split the
    text once per bigram, O(tokens^2) per doc)."""
    toks_src = f"split(lower(trim({text_col})), '\\\\s+')"
    # CASE-guarded for docs shorter than 2 tokens: sequence(1, 0) is
    # DESCENDING [1, 0] in Spark (not empty) and slice(toks, 0, 2)
    # throws — the same documented trap shingles() guards. NULL out.
    return F.expr(
        f"transform(array({toks_src}), toks -> "
        f"CASE WHEN size(toks) >= 2 THEN "
        f"aggregate("
        f"  transform(sequence(1, size(toks) - 1),"
        f"            i -> concat_ws(' ', slice(toks, i, 2))),"
        f"  0L,"
        f"  (acc, b) -> acc + CAST(conv(substring(md5(b), 1, 15), 16, 10) AS BIGINT) % 6000000L + 500000L"
        f") DIV (size(toks) - 1) "
        f"ELSE CAST(NULL AS BIGINT) END)[0]"
    )


def perplexity_buckets(docs: DataFrame, materialize: bool = True) -> DataFrame:
    """CCNet head/middle/tail bucketing over ``hash_lm_ppl_micro``
    scores: per-language percentile edges from a (lang, 10k-bin)
    HISTOGRAM + broadcast join back — no corpus-sized window, no
    per-lang global sort (the text_length_percentiles pattern).

    ``materialize`` (default): the interpreted per-bigram fold is the
    dominant cost and the scored frame has two consumers (histogram
    branch + output join) — persist with a count() barrier so the
    consumers never race a cold cache, block the result back with an
    eager localCheckpoint, release the cache (the minhash discipline).
    Pass False for a fully lazy plan (plan inspection / composition)."""
    from pyspark.sql import Window as W

    scored = (
        docs.where(F.size(tokens("text")) >= 2)
        .select(
            "doc_id", "lang",
            hash_lm_ppl_micro("text").alias("ppl_micro"),
        )
        .withColumn("bin", F.col("ppl_micro") - F.col("ppl_micro") % 10000)
    )
    if materialize:
        scored = scored.persist()
        scored.count()
    hist = scored.groupBy("lang", "bin").agg(F.count("*").alias("cnt"))
    wh = W.partitionBy("lang").orderBy("bin")
    cum = hist.select(
        "lang", "bin",
        F.sum("cnt").over(wh).alias("cum"),
        F.sum("cnt").over(W.partitionBy("lang")).alias("n"),
    )
    edges = cum.groupBy("lang").agg(
        F.min(F.when(10 * F.col("cum") >= 3 * F.col("n"), F.col("bin"))).alias("head_edge"),
        F.min(F.when(20 * F.col("cum") >= 13 * F.col("n"), F.col("bin"))).alias("mid_edge"),
    )
    res = scored.join(F.broadcast(edges), "lang").select(
        "doc_id", "lang", "ppl_micro",
        F.when(F.col("bin") <= F.col("head_edge"), F.lit("head"))
        .when(F.col("bin") <= F.col("mid_edge"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    if materialize:
        res = res.localCheckpoint(eager=True)
        scored.unpersist()
    return res


def quality_classifier_margin(
    docs: DataFrame, text_col: str, id_col: str, min_df: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """fastText-style LINEAR quality classifier (Joulin et al. 2016 —
    the CommonCrawl-vs-curated filter LLaMA/CCNet-style pipelines run
    after rule gates): score(doc) = Σ_token w(token), keep-decision by
    sign. The container has no trained weights, so w is a
    DETERMINISTIC HASH STUB — w(token) = (md5-60bit(token) mod
    2000001) − 1e6 integer micro-units — with the Spark plumbing real:
    a bounded vocab (doc_freq >= ``min_df``) broadcast to a hash join
    over the exploded token stream, map-side partial sums, one shuffle
    on doc id. Swapping in real weights is replacing the w expression
    with the trained table — same join, same shapes.

    Returns (id, margin_micro BIGINT): exact integer margins; OOV
    tokens score 0; a doc with no vocab token scores 0 (the bias-only
    margin). Scale: the vocab side is bounded by min_df (production
    additionally caps |vocab|; the broadcast is the same), the corpus
    side is scan-shaped — no corpus self-join anywhere. The exploded
    token stream feeds BOTH the vocab doc-freq aggregation and the
    scoring join, so it is persisted for the fixture's two consumers
    (one corpus read, not two); the production path — a trained weight
    table replacing the hash stub — removes the vocab pass entirely
    and with it the persist."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("__tok"),
    ).persist()
    vocab = (
        toks.groupBy("__tok")
        .agg(F.countDistinct(id_col).alias("__df"))
        .where(F.col("__df") >= min_df)
        .select(
            "__tok",
            (
                F.conv(F.substring(F.md5("__tok"), 1, 15), 16, 10).cast("bigint")
                % F.lit(2000001)
                - F.lit(1000000)
            ).alias("__w"),
        )
    )
    scored = (
        toks.join(F.broadcast(vocab), "__tok", "left")
        .groupBy(id_col)
        .agg(F.coalesce(F.sum("__w"), F.lit(0)).cast("bigint").alias("margin_micro"))
    )
    res = docs.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("margin_micro", F.lit(0)).cast("bigint").alias("margin_micro"),
    )
    if materialize:
        res = res.localCheckpoint(eager=True)
        toks.unpersist()
    return res


def bigram_lm_table(
    docs: DataFrame, text_col: str, min_count: int = 3
) -> DataFrame:
    """Count-based bigram LM TRAINING table (the thing
    ``hash_lm_ppl_micro`` stubs at scoring time — building the real
    broadcast table is itself a corpus-scale pipeline op): one pass
    explodes bigrams, one aggregation counts them, the context totals
    are a re-aggregation OF THE COUNTS (never a second corpus scan),
    and add-1-smoothed probabilities are exact integers —
    prob_e6 = (c+1)·1e6 DIV (ctx + |V|) — so the table replays
    bit-for-bit in an oracle and broadcast-joins into a scorer without
    any float on a hashed surface.

    Returns (w1, w2, n_bigram, n_context, prob_e6) for bigrams with
    count >= ``min_count`` (the output-size knob; contexts and |V| are
    still computed over ALL bigrams, so kept probabilities are the
    true smoothed ones). Scale: shuffle on bigram, then on w1 over the
    already-aggregated counts — vocabulary-sized, not corpus-sized.
    The context totals are a WINDOW over the counts rather than a
    re-aggregation of the same DataFrame: Catalyst has no physical CSE
    across a reused lineage, so ``c.groupBy(w1)`` would re-scan and
    re-explode the whole corpus a second time (plan-pinned in
    tests/test_plans.py::test_bigram_lm_contexts_reaggregate_counts)."""
    toks = docs.select(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("__t")
    )
    # sequence(1, 0) is DESCENDING in Spark — guard docs under 2 tokens
    pairs = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(__t) >= 2 THEN transform("
                "  sequence(1, size(__t) - 1),"
                "  i -> named_struct('w1', element_at(__t, i),"
                "                    'w2', element_at(__t, i + 1)))"
                " ELSE array() END"
            )
        ).alias("__b")
    ).select("__b.w1", "__b.w2")
    from pyspark.sql import Window as W

    c = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_bigram"))
    c = c.withColumn(
        "n_context", F.sum("n_bigram").over(W.partitionBy("w1"))
    )
    v = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("__tok")
        )
        .agg(F.countDistinct("__tok").alias("__v"))
    )
    return (
        c.crossJoin(F.broadcast(v))
        .where(F.col("n_bigram") >= min_count)
        .select(
            "w1", "w2",
            F.col("n_bigram").cast("bigint").alias("n_bigram"),
            F.col("n_context").cast("bigint").alias("n_context"),
            F.expr("(n_bigram + 1) * 1000000 DIV (n_context + __v)")
            .cast("bigint").alias("prob_e6"),
        )
    )


def prefix_fingerprint(col: Column | str, n_tokens: int = 50) -> Column:
    """Prefix fingerprint: md5 over the first ``n_tokens`` whitespace
    tokens of lowercased text — the truncation-duplicate key (the same
    article cut at different lengths shares a prefix but not a
    whole-document fingerprint; crawl pipelines dedup on a head-of-doc
    hash for exactly this). Map-only; pairs with
    ``dedup.prefix_dedup``."""
    return F.md5(F.array_join(F.slice(tokens(col), 1, n_tokens), " "))


def tokenizer_fertility(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Per-group tokenizer FERTILITY / compression census — the
    tokenizer-fit report multilingual pipelines run per source or
    language (a tokenizer with high fertility on a domain wastes
    context window there): for each group, doc count, whitespace-word
    and BPE-estimate token totals, char total, and two integral
    ratios — fertility_ppm = BPE tokens per word x 1e6 (how many
    subwords a word splits into) and chars_per_token_ppm = chars per
    BPE token x 1e6 (compression). Integral DIV — engine-exact, no
    float summation order. One scan, one |groups|-row aggregation."""
    from pyspark.sql import DataFrame as _DF  # noqa: F401  (signature import)

    c = F.col(text_col)
    return (
        df.select(
            F.col(group_col),
            F.length(c).cast("bigint").alias("__chars"),
            token_count(c).cast("bigint").alias("__words"),
            bpe_token_estimate(c).cast("bigint").alias("__bpe"),
        )
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__chars").alias("n_chars"),
            F.sum("__words").alias("n_words"),
            F.sum("__bpe").alias("n_bpe_tokens"),
        )
        .select(
            group_col, "n_docs", "n_chars", "n_words", "n_bpe_tokens",
            F.expr("n_bpe_tokens * 1000000L div n_words")
            .alias("fertility_ppm"),
            F.expr("n_chars * 1000000L div n_bpe_tokens")
            .alias("chars_per_token_ppm"),
        )
    )


def source_distribution_drift(
    df: DataFrame, text_col: str, source_col: str, top_n: int = 200
) -> DataFrame:
    """Corpus-mixture DRIFT monitor (r12): pairwise total-variation
    distance between per-source unigram distributions over the global
    ``top_n`` vocabulary — the periodic report a training-mixture
    pipeline runs to catch a source whose content shifted (crawl went
    stale, boilerplate flooded in) before it skews the mix. Pure
    integer arithmetic end-to-end (the repo float rule):
    ``tv(a,b) = tv_num / (2 * total_a * total_b)`` where
    ``tv_num = Σ_tok |cnt_a·total_b − cnt_b·total_a|`` — the exact
    cross-multiplied numerator, so equal distributions give exactly 0
    and disjoint ones 2·total_a·total_b. Returns one row per unordered
    source pair: (source_a, source_b, tv_num, total_a, total_b).

    Scale: the vocabulary is a bounded top-N broadcast (ties break on
    token text — deterministic); per-source counts are ONE shuffle on
    (source, tok); the pairwise stage runs on the |sources| × top_n
    grid (tiny — the corpus is never self-joined). At extreme counts
    (cnt·total beyond ~9e18) pre-scale counts or lift to DECIMAL —
    the fixture regime fits BIGINT with 5 orders of headroom."""
    tok = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("tok"),
    )
    # vocab (top_n rows) and cnts (|sources| x top_n rows) each feed
    # MULTIPLE downstream consumers; without the lazy localCheckpoint
    # barriers Catalyst re-derived the corpus explode for every one of
    # them — the plan audit read TEN documents scans / 15 shuffles for
    # this report (r12). With both bounded frames materialized, the
    # corpus is tokenized exactly twice (vocab pass, counts pass — the
    # data-dependency floor: counts filter on the completed vocab) and
    # everything downstream runs on sub-thousand-row frames.
    # Recompute-on-loss caveat as documented at dedup.jaccard_verify.
    vocab = (
        tok.groupBy("tok").count()
        .orderBy(F.col("count").desc(), "tok")
        .limit(top_n)
        .select("tok")
    ).localCheckpoint(eager=False)
    cnts = (
        tok.join(F.broadcast(vocab), "tok")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    ).localCheckpoint(eager=False)
    totals = cnts.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("total")
    )
    grid = totals.crossJoin(F.broadcast(vocab))
    full = (
        grid.join(cnts, ["source", "tok"], "left")
        .fillna(0, subset=["cnt"])
    )
    a = full.select(
        F.col("source").alias("source_a"), "tok",
        F.col("cnt").alias("__ca"), F.col("total").alias("total_a"),
    )
    b = full.select(
        F.col("source").alias("source_b"), "tok",
        F.col("cnt").alias("__cb"), F.col("total").alias("total_b"),
    )
    return (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b", "total_a", "total_b")
        .agg(
            F.sum(F.abs(
                F.col("__ca") * F.col("total_b")
                - F.col("__cb") * F.col("total_a")
            )).cast("bigint").alias("tv_num")
        )
        .select("source_a", "source_b", "tv_num", "total_a", "total_b")
    )
