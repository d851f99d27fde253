"""Text-analysis pipeline queries (BASELINE.json north-star extras)
over the documents fixture — language-ID, quality scoring, token
counting, fingerprinting, all via pipeline.text (pure JVM-side
expressions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.pipeline.text import (
    STOPWORDS,
    bag_fingerprint,
    bpe_token_estimate,
    fingerprint,
    hash_lm_ppl_micro,
    language_id,
    quality_signals,
    token_count,
    tokens,
)
from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load

_TOKS = "str_split_regex(lower(trim(text)), '\\s+')"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           CAST(floor(length(text) / 4) AS BIGINT) + len({_TOKS}) AS bpe_estimate,
           round(length(array_to_string({_TOKS}, '')) / len({_TOKS}), 4) AS mean_tok_len,
           round(len(list_distinct({_TOKS})) / len({_TOKS}), 4) AS uniq_ratio,
           round(len(list_intersect({_TOKS},
                 ['the','a','of','and','is','to','in'])) / len({_TOKS}), 4) AS stopword_ratio,
           round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text), 4) AS alpha_ratio
    FROM documents
    """,
    tags=("pipeline", "text"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality signals (Gopher/C4-style)."""
    d = load(spark, sf_dir, "documents")
    sig = quality_signals("text")
    return d.select(
        "doc_id",
        sig["n_tokens"].alias("n_tokens"),
        bpe_token_estimate("text").alias("bpe_estimate"),
        F.round(sig["mean_tok_len"], 4).alias("mean_tok_len"),
        F.round(sig["uniq_ratio"], 4).alias("uniq_ratio"),
        F.round(sig["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(sig["alpha_ratio"], 4).alias("alpha_ratio"),
    )


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_intersect({_TOKS}, [{words}]))"


_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN {_lang_hits_sql(lang)} > 0 AND {_lang_hits_sql(lang)} = "
        f"greatest({', '.join(_lang_hits_sql(l2) for l2 in sorted(STOPWORDS))}) THEN '{lang}'"
        for lang in sorted(STOPWORDS)
    )
    + " ELSE 'und' END"
)


@query(
    "text_language_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang, {_LANG_CASE} AS predicted_lang
    FROM documents
    """,
    tags=("pipeline", "text"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language-ID heuristic (argmax over per-language
    function-word hits, deterministic tie-break)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        language_id("text").alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS bag_fp
    FROM documents
    """,
    tags=("pipeline", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: normalized-content md5 + order-
    insensitive token-bag md5."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        bag_fingerprint("text").alias("bag_fp"),
    )


@query(
    "text_quality_filter",
    oracle=f"""
    SELECT doc_id, n_chars,
           len({_TOKS}) AS n_tokens
    FROM documents
    WHERE len({_TOKS}) BETWEEN 20 AND 1000
      AND len(list_distinct({_TOKS})) / len({_TOKS}) > 0.1
      AND n_chars >= 100
    """,
    tags=("pipeline", "text"),
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed quality gate a pretraining pipeline applies before
    dedup: token-count band + repetition + length floors."""
    d = load(spark, sf_dir, "documents")
    n = token_count("text")
    sig = quality_signals("text")
    return d.where(
        n.between(20, 1000) & (sig["uniq_ratio"] > 0.1) & (F.col("n_chars") >= 100)
    ).select("doc_id", "n_chars", n.alias("n_tokens"))


@query(
    "text_pii_scrub",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   text || ' contact user' || doc_id || '@example.com call 555-123-4567 host 10.1.2.' || (doc_id % 256) || ' ssn 123-45-6789',
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b(?:\\+?1[-. ]?)?(?:\\(\\d{3}\\)|\\d{3})[-. ]?\\d{3}[-. ]?\\d{4}\\b', '<PHONE>', 'g'),
               '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
             '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') AS scrubbed
    FROM documents WHERE doc_id % 17 = 0
    """,
    tags=("pipeline", "text"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (training-data redaction): email/phone/IPv4/SSN →
    typed placeholders, chained codegen'd regexp_replace. PII is
    injected deterministically from doc_id so the scrub is exercised on
    every row (the synthetic corpus contains none)."""
    from flink_1_16_0_src_spark.pipeline.text import pii_scrub

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 17 == 0)
    with_pii = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com call 555-123-4567 host 10.1.2."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(" ssn 123-45-6789"),
    )
    return d.select("doc_id", pii_scrub(with_pii).alias("scrubbed"))


@query(
    "text_repetition",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id % 13 = 0
    ), base AS (
      SELECT doc_id, len(w) AS n_words,
             (20000 * (len(w) - len(list_distinct(w))) + len(w)) // (2 * len(w))
               AS dup_word_frac_e4, w
      FROM words WHERE len(w) >= 2
    ), big AS (
      SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
      FROM base
    ), cnt AS (
      SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg
    ), top AS (
      SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_bigrams
      FROM cnt GROUP BY doc_id
    )
    SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
           CAST(b.dup_word_frac_e4 AS BIGINT) AS dup_word_frac_e4,
           CAST((20000 * t.top_c + t.n_bigrams) // (2 * t.n_bigrams) AS BIGINT)
             AS top_bigram_frac_e4
    FROM base b JOIN top t ON b.doc_id = t.doc_id
    """,
    tags=("pipeline", "text"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (Gopher-style): duplicate-word
    fraction (array built-ins) + top-bigram fraction (explode + count —
    relational, shuffles on doc_id only). Fractions are emitted in
    exact 1e-4 units via half-up INTEGER division — round(p/q, 4) on a
    double ratio is a cross-engine boundary lottery when q divides
    20000 (the cluster_kmeans_update driver-fail class); the integer
    form (20000·p + q) div (2·q) is engine-exact by construction."""
    from flink_1_16_0_src_spark.pipeline.text import repetition_signals

    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 13 == 0)
    w = F.split(F.col("text"), " ")
    sig = repetition_signals("text")
    dup_e4 = F.expr(
        "(20000 * (size(split(text, ' ')) - size(array_distinct(split(text, ' '))))"
        " + size(split(text, ' '))) div (2 * size(split(text, ' ')))"
    )
    base = d.select(
        "doc_id",
        sig["n_words"].alias("n_words"),
        dup_e4.cast("bigint").alias("dup_word_frac_e4"),
        w.alias("w"),
    ).where(F.col("n_words") >= 2)
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")
        ).alias("bg"),
    )
    cnt = bigrams.groupBy("doc_id", "bg").count()
    top = cnt.groupBy("doc_id").agg(
        F.max("count").alias("top_c"), F.sum("count").cast("bigint").alias("n_bigrams")
    )
    return base.drop("w").join(top, "doc_id").select(
        "doc_id",
        "n_words",
        "dup_word_frac_e4",
        F.expr("(20000 * top_c + n_bigrams) div (2 * n_bigrams)")
        .cast("bigint")
        .alias("top_bigram_frac_e4"),
    )


@query(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(str_split_regex(lower(text), '')) AS ch
      FROM documents WHERE doc_id < 200
    ),
    freq AS (
      SELECT doc_id, ch, count(*) AS c FROM chars WHERE ch <> '' GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY 1)
    SELECT f.doc_id,
           round(-sum((c / n) * log2(c / n)), 4) AS entropy
    FROM freq f JOIN tot t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id
    """,
    tags=("pipeline", "text"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    cheap quality/perplexity proxy for corpus filtering (low entropy =
    repetitive boilerplate, high = noise/binary-ish). Pure Catalyst:
    explode chars → frequency groupBy → -Σ p·log2 p; two shuffles both
    keyed by doc_id."""
    d = load(spark, sf_dir, "documents").where("doc_id < 200")
    chars = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "")).alias("ch")
    ).where(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    tot = freq.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log2(p)), 4).alias("entropy"))
    )


_GRAMS4 = (
    f"list_distinct(list_transform(generate_series(1, greatest(len({_TOKS}) - 3, 0)),"
    f" i -> array_to_string(({_TOKS})[i:i+3], ' ')))"
)


@query(
    "text_boilerplate_ngrams",
    oracle=f"""
    SELECT ngram, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (SELECT doc_id, unnest({_GRAMS4}) AS ngram FROM documents)
    GROUP BY ngram HAVING count(DISTINCT doc_id) >= 3
    """,
    tags=("pipeline", "text", "custom-op"),
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate detection: 4-grams shared by >= 3
    distinct documents (headers/footers/license blurbs) — one explode,
    one gram-keyed groupBy with map-side distinct folding."""
    from flink_1_16_0_src_spark.pipeline.text import boilerplate_ngrams

    d = load(spark, sf_dir, "documents")
    return boilerplate_ngrams(d, "text", "doc_id", n=4, min_docs=3)


@query(
    "vocab_top_tokens",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(str_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    )
    SELECT tok, CAST(count(*) AS BIGINT) AS n_occ,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(row_number() OVER (ORDER BY count(*) DESC, tok) AS INT) AS rank_num
    FROM toks GROUP BY tok
    QUALIFY rank_num <= 50
    """,
    tags=("pipeline", "text", "vocab"),
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: exact top-50 tokens by occurrence count
    (+ document frequency) — the first pass of tokenizer/vocab
    construction. One explode + one groupBy(token) with map-side
    partials; at 100 TB swap the exact groupBy for
    operators.sketch.approx_top_k (same output contract) — this exact
    form is the oracle-checkable baseline. Integer counts only, so the
    rank is engine-exact (ties break on the token string)."""
    from flink_1_16_0_src_spark.pipeline.text import tokens

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    from pyspark.sql import Window as W

    agg = toks.groupBy("tok").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    # Top-50 via orderBy().limit() = TakeOrderedAndProject (per-partition
    # size-50 heap + driver merge), NOT an unpartitioned row_number()
    # window — the vocabulary is all distinct tokens of the corpus
    # (10^7-10^8 at real scale) and a global window would sort it in one
    # task. The rank window after the limit covers exactly 50 rows.
    top = (
        agg.select(
            "tok", F.col("n_occ").cast("bigint").alias("n_occ"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
        )
        .orderBy(F.col("n_occ").desc(), "tok")
        .limit(50)
    )
    w = W.orderBy(F.col("n_occ").desc(), "tok")
    return top.withColumn("rank_num", F.row_number().over(w).cast("int")).select(
        "tok", "n_occ", "n_docs", "rank_num"
    )


@query(
    "text_chunk_windows",
    oracle="""
    WITH toks AS (
      SELECT doc_id, str_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents WHERE doc_id % 11 = 0
    )
    SELECT doc_id,
           CAST(s.i AS BIGINT) AS chunk_id,
           CAST(s.i * 24 + 1 AS BIGINT) AS tok_start,
           CAST(least(s.i * 24 + 32, len(w)) AS BIGINT) AS tok_end,
           array_to_string(w[s.i * 24 + 1 : least(s.i * 24 + 32, len(w))], ' ') AS chunk
    FROM toks, generate_series(0, 1000000) s(i)
    WHERE s.i * 24 < len(w)
    """,
    tags=("pipeline", "text", "custom-op"),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap: each doc explodes into
    32-token windows at stride 24 (8-token overlap) — how long
    documents become training sequences without losing cross-boundary
    context. Map-side explode only (no shuffle; fan-out bounded by
    doc_len/stride); window starts are sequence() positions so the
    chunking is position-exact on both engines: one window per stride
    while any token remains past the start (final windows are partial —
    the padding-aware consumer is sequence packing)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 11 == 0)
    from flink_1_16_0_src_spark.pipeline.text import tokens

    size, stride = 32, 24
    w = tokens("text")
    staged = d.select("doc_id", w.alias("w"), F.size(w).alias("__n"))
    # one window start per stride while tokens remain: i = 0 .. (n-1) div stride
    idx = F.expr(f"sequence(0, (__n - 1) div {stride})")
    chunks = staged.where(F.col("__n") > 0).select(
        "doc_id", "w", "__n", F.explode(idx).alias("i")
    )
    start = F.col("i") * stride + 1
    end = F.least(F.col("i") * stride + size, F.col("__n"))
    return chunks.select(
        "doc_id",
        F.col("i").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("tok_start"),
        end.cast("bigint").alias("tok_end"),
        F.concat_ws(" ", F.slice(F.col("w"), start, end - start + 1)).alias("chunk"),
    )


@query(
    "vocab_bpe_pair_counts",
    oracle="""
    WITH toks AS (
      SELECT doc_id, str_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    pairs AS (
      SELECT w[s.i] || ' ' || w[s.i + 1] AS pair
      FROM toks, generate_series(1, 1000000) s(i)
      WHERE s.i < len(w)
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n_occ,
           CAST(row_number() OVER (ORDER BY count(*) DESC, pair) AS INT) AS rank_num
    FROM pairs GROUP BY pair
    QUALIFY rank_num <= 40
    """,
    tags=("pipeline", "text", "vocab"),
)
def vocab_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate counting — the second pass of tokenizer
    construction after the vocab head (``vocab_top_tokens``): corpus
    frequencies of ADJACENT token pairs; each merge round takes the
    most frequent pair (Sennrich et al., Neural Machine Translation of
    Rare Words with Subword Units). Map-side pair explode (fan-out =
    tokens-1 per doc, no shuffle before the pair groupBy) + one
    pair-keyed count; exact top-40 via orderBy().limit() =
    TakeOrderedAndProject, never a vocabulary-sized single-partition
    window sort. At 100 TB swap the exact count for
    operators.sketch heavy hitters — this exact form is the
    oracle-checkable baseline."""
    from flink_1_16_0_src_spark.pipeline.text import tokens
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = d.select(tokens("text").alias("w"))
    pairs = toks.where(F.size("w") > 1).select(
        F.explode(
            F.expr("transform(sequence(1, size(w) - 1), i -> concat(w[i - 1], ' ', w[i]))")
        ).alias("pair")
    )
    agg = pairs.groupBy("pair").agg(F.count("*").cast("bigint").alias("n_occ"))
    top = agg.orderBy(F.col("n_occ").desc(), "pair").limit(40)
    w = W.orderBy(F.col("n_occ").desc(), "pair")
    return top.withColumn("rank_num", F.row_number().over(w).cast("int")).select(
        "pair", "n_occ", "rank_num"
    )


@query(
    "text_length_percentiles",
    oracle="""
    WITH r AS (
      SELECT lang, doc_id, n_chars,
             rank() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(floor((20000 * rk + n) / (2.0 * n)) AS BIGINT) AS pctile_e4
    FROM r WHERE doc_id % 17 = 0
    """,
    tags=("pipeline", "text", "custom-op"),
)
def text_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length percentile ranks (min-rank over
    n_chars: ties share a percentile — SQL rank() semantics) — the
    length-distribution curriculum ordering and packing-bin sizing
    read, in exact e4 units (floor-half-up integer arithmetic).

    Scale shape: NO corpus-sized window. The rank comes from the
    per-(lang, n_chars) HISTOGRAM — one groupBy to ≤ |langs|·|distinct
    lengths| cells, a window over that tiny histogram (the
    sketch_histogram_quantiles pattern), and a broadcast join back to
    the documents — a per-lang window over the raw corpus would put
    each language's entire corpus through one task at 100 TB (the
    single-partition-sort class VERDICT r4 flagged). The oracle's
    direct window over `documents` computes the same min-rank."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    hist = d.groupBy("lang", "n_chars").agg(F.count("*").alias("cnt"))
    wh = W.partitionBy("lang").orderBy("n_chars")
    cum = hist.select(
        "lang", "n_chars",
        (F.sum("cnt").over(wh) - F.col("cnt") + 1).alias("rk"),
        F.sum("cnt").over(W.partitionBy("lang")).alias("n"),
    )
    pct = F.floor((20000 * F.col("rk") + F.col("n")) / (2.0 * F.col("n")))
    return (
        d.where(F.col("doc_id") % 17 == 0)
        .join(F.broadcast(cum), ["lang", "n_chars"])
        .select("lang", "doc_id", "n_chars", pct.cast("bigint").alias("pctile_e4"))
    )


_GOPHER_STOPS_SQL = "['the','a','of','and','is','to','in']"


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id,
             len({_TOKS}) AS n_words,
             length(array_to_string({_TOKS}, '')) AS sum_wchars,
             len(list_filter({_TOKS}, w -> regexp_matches(w, '[a-z]'))) AS n_alpha_words,
             len(list_filter({_TOKS}, w -> w = '#' OR w = '…')) AS n_symbol_words,
             len(list_intersect({_TOKS}, {_GOPHER_STOPS_SQL})) AS stop_hits
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST((20000 * sum_wchars + n_words) // (2 * n_words) AS BIGINT) AS mean_wlen_e4,
           CAST(n_alpha_words AS BIGINT) AS n_alpha_words,
           CAST(n_symbol_words AS BIGINT) AS n_symbol_words,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS INT) AS wc_ok,
           CAST(CASE WHEN sum_wchars BETWEEN 3 * n_words AND 10 * n_words
                THEN 1 ELSE 0 END AS INT) AS mwl_ok,
           CAST(CASE WHEN 10 * n_symbol_words <= n_words THEN 1 ELSE 0 END AS INT) AS sym_ok,
           CAST(CASE WHEN 10 * n_alpha_words >= 8 * n_words THEN 1 ELSE 0 END AS INT) AS alpha_ok,
           CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS INT) AS stop_ok,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                      AND sum_wchars BETWEEN 3 * n_words AND 10 * n_words
                      AND 10 * n_symbol_words <= n_words
                      AND 10 * n_alpha_words >= 8 * n_words
                      AND stop_hits >= 2
                THEN 1 ELSE 0 END AS INT) AS gopher_pass
    FROM sig
    """,
    tags=("pipeline", "text", "quality"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule panel (Rae et al. 2021, Appendix A): word
    count in [50, 100k], mean word length in [3, 10], symbol-word
    (# / ellipsis) ratio <= 0.1, >= 80% alphabetic words, >= 2 distinct
    function words — each rule emitted as its own 0/1 flag plus the
    composed gate. Every threshold is an exact integer
    cross-multiplication (never a float ratio on the hashed surface:
    the round(double) divergence class from the kmeans driver fails);
    mean word length is reported in half-up e4 units via the
    (20000*p + q) div (2*q) identity. Map-only at any corpus size —
    the whole panel is one projection over the scan."""
    from flink_1_16_0_src_spark.pipeline.text import gopher_signals_struct

    d = load(spark, sf_dir, "documents")
    # fused struct, projected once then field-extracted: one tokenizer
    # pass per row instead of five (see gopher_signals_struct)
    base = d.select("doc_id", gopher_signals_struct("text").alias("__gs")).select(
        "doc_id",
        F.col("__gs")["n_words"].alias("n_words"),
        F.col("__gs")["sum_wchars"].alias("sum_wchars"),
        F.col("__gs")["n_alpha_words"].alias("n_alpha_words"),
        F.col("__gs")["n_symbol_words"].alias("n_symbol_words"),
        F.col("__gs")["stop_hits"].alias("stop_hits"),
    )
    wc_ok = F.col("n_words").between(50, 100000)
    mwl_ok = F.col("sum_wchars").between(3 * F.col("n_words"), 10 * F.col("n_words"))
    sym_ok = 10 * F.col("n_symbol_words") <= F.col("n_words")
    alpha_ok = 10 * F.col("n_alpha_words") >= 8 * F.col("n_words")
    stop_ok = F.col("stop_hits") >= 2
    return base.select(
        "doc_id",
        "n_words",
        F.expr("(20000 * sum_wchars + n_words) div (2 * n_words)")
        .cast("bigint")
        .alias("mean_wlen_e4"),
        "n_alpha_words",
        "n_symbol_words",
        "stop_hits",
        wc_ok.cast("int").alias("wc_ok"),
        mwl_ok.cast("int").alias("mwl_ok"),
        sym_ok.cast("int").alias("sym_ok"),
        alpha_ok.cast("int").alias("alpha_ok"),
        stop_ok.cast("int").alias("stop_ok"),
        (wc_ok & mwl_ok & sym_ok & alpha_ok & stop_ok).cast("int").alias("gopher_pass"),
    )


def _c4_line_sql(i: int) -> str:
    """DuckDB fragment for decorated line ``i`` — MUST stay the exact
    twin of the Spark-side construction in text_c4_line_filter."""
    start = 1 + 12 * i
    # coalesce: DuckDB array_to_string(empty_list) is NULL (would poison
    # the || chain); Spark concat_ws of an empty slice is '' — align on ''
    base = f"coalesce(array_to_string(({_TOKS})[{start}:{start + 11}], ' '), '')"
    extra = ""
    if i == 0:
        extra = " || CASE WHEN doc_id % 7 = 0 THEN ' {' ELSE '' END"
    elif i == 2:
        extra = " || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END"
    term = f" || CASE WHEN (doc_id + {i}) % 3 <> 0 THEN '.' ELSE '' END"
    return base + extra + term


@query(
    "text_c4_line_filter",
    oracle=f"""
    WITH lined AS (
      SELECT doc_id,
             [{_c4_line_sql(0)}, {_c4_line_sql(1)}, {_c4_line_sql(2)}, {_c4_line_sql(3)}] AS ls
      FROM documents
    ), stats AS (
      SELECT doc_id, ls,
             list_filter(ls, l -> regexp_matches(l, '[.!?"]$')
                                  AND len(string_split(l, ' ')) >= 5) AS kept,
             array_to_string(ls, chr(10)) AS doc
      FROM lined
    )
    SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept_lines,
           md5(coalesce(array_to_string(kept, chr(10)), '')) AS kept_md5,
           CAST(length(regexp_replace(doc, '[^.!?]', '', 'g')) AS BIGINT) AS n_sentences,
           CAST(CASE WHEN contains(doc, '{{') THEN 1 ELSE 0 END AS INT) AS has_brace,
           CAST(CASE WHEN contains(doc, 'lorem ipsum') THEN 1 ELSE 0 END AS INT) AS has_lorem,
           CAST(CASE WHEN len(kept) >= 1
                      AND length(regexp_replace(doc, '[^.!?]', '', 'g')) >= 3
                      AND NOT contains(doc, '{{')
                      AND NOT contains(doc, 'lorem ipsum')
                THEN 1 ELSE 0 END AS INT) AS c4_keep
    FROM stats
    """,
    tags=("pipeline", "text", "quality"),
)
def text_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line/page cleaning (Raffel et al. 2020, §2.2): keep only
    lines ending in terminal punctuation with >= 5 words; drop pages
    containing '{' or 'lorem ipsum' or with < 3 sentences. The fixture
    corpus has no line structure or punctuation, so each document is
    deterministically re-lined from doc_id (12-token lines; line i gets
    a terminal '.' unless (doc_id+i)%3==0; '{' injected on doc_id%7,
    'lorem ipsum' on doc_id%11) — the same injected-decoration
    precedent as text_pii_scrub, so every rule binds on every run.

    Scale shape: the per-doc line array never leaves its row — the
    whole filter is higher-order array functions inside one projection
    (map-only, whole-stage codegen), no explode and no shuffle at any
    corpus size."""
    from flink_1_16_0_src_spark.pipeline.text import c4_line_stats, tokens

    d = load(spark, sf_dir, "documents")
    toks = tokens("text")

    def line(i: int):
        base = F.concat_ws(" ", F.slice(toks, 1 + 12 * i, 12))
        parts = [base]
        if i == 0:
            parts.append(F.when(F.col("doc_id") % 7 == 0, F.lit(" {")).otherwise(F.lit("")))
        elif i == 2:
            parts.append(
                F.when(F.col("doc_id") % 11 == 0, F.lit(" lorem ipsum")).otherwise(F.lit(""))
            )
        parts.append(
            F.when((F.col("doc_id") + i) % 3 != 0, F.lit(".")).otherwise(F.lit(""))
        )
        return F.concat(*parts)

    lined = d.select("doc_id", F.array(line(0), line(1), line(2), line(3)).alias("ls"))
    st = c4_line_stats(F.col("ls"))
    keep = (
        (st["n_kept_lines"] >= 1)
        & (st["n_sentences"] >= 3)
        & (st["has_brace"] == 0)
        & (st["has_lorem"] == 0)
    )
    return lined.select(
        "doc_id",
        st["n_lines"].alias("n_lines"),
        st["n_kept_lines"].alias("n_kept_lines"),
        F.md5(st["kept_text"]).alias("kept_md5"),
        st["n_sentences"].alias("n_sentences"),
        st["has_brace"].alias("has_brace"),
        st["has_lorem"].alias("has_lorem"),
        keep.cast("int").alias("c4_keep"),
    )


_TFIDF_TERMS = ("table", "window", "hash", "stream")


@query(
    "text_tfidf_topk",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl FROM (
        SELECT doc_id, len({_TOKS}) AS dl, unnest({_TOKS}) AS term FROM documents
      ) WHERE term IN {str(tuple(_TFIDF_TERMS))}
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_terms_matched,
           CAST(sum((1000000 * tf * n_docs) // ((df + 1) * dl)) AS BIGINT) AS score_e6
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
    GROUP BY doc_id
    ORDER BY score_e6 DESC, doc_id
    LIMIT 20
    """,
    tags=("pipeline", "text", "retrieval"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF retrieval over the corpus: score each document against a
    fixed query-term set and return the exact top-20. The idf is the
    rational N/(df+1) (no log), so every per-term contribution is the
    exact integer (1e6·tf·N) div ((df+1)·dl) — engine-identical by
    construction (a float log-idf would put a transcendental on the
    hashed surface). At oracle scales the numerator stays far below
    2^63; a true 100 TB deployment would switch the idf to a double
    after correctness is pinned, with this form as its oracle.

    Scale shape: one corpus scan (explode + IN-list filter keeps only
    query-term postings, so the shuffle carries |terms|·|matching docs|
    rows, not the corpus); tf folds map-side on (doc_id, term); the
    |terms|-row df table and the 1-row corpus count are broadcast; the
    final top-k is orderBy().limit() = TakeOrderedAndProject (per-
    partition heap + driver merge), never a global sort."""
    from flink_1_16_0_src_spark.pipeline.text import tokens

    d = load(spark, sf_dir, "documents")
    toks = tokens("text")
    postings = d.select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).where(F.col("term").isin(*_TFIDF_TERMS))
    # materialize tf ONCE (lazy localCheckpoint, the jaccard_verify
    # precedent): tf feeds both the score join and the df aggregation,
    # and without the barrier the dfreq subtree re-ran the corpus
    # explode+IN-filter scan a second time (Catalyst has no CSE across
    # DataFrame reuse). Size is bounded by |query terms| rows per
    # matching doc — tiny at any corpus scale. Recompute-on-executor-
    # loss caveat as documented at dedup.jaccard_verify.
    tf = postings.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    ).localCheckpoint(eager=False)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms_matched"),
            F.sum(F.expr("(1000000 * tf * n_docs) div ((df + 1) * dl)"))
            .cast("bigint")
            .alias("score_e6"),
        )
    )
    return scored.orderBy(F.col("score_e6").desc(), "doc_id").limit(20)


@query(
    "text_langid_eval",
    oracle=f"""
    WITH pred AS (
      SELECT doc_id, lang AS labeled, {_LANG_CASE} AS predicted
      FROM documents
    )
    SELECT labeled, predicted,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN labeled = predicted THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS acc_e4
    FROM pred GROUP BY labeled, predicted
    """,
    tags=("pipeline", "text", "eval"),
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval harness for the language-ID heuristic: the
    confusion matrix against the corpus's labeled ``lang`` column —
    (labeled, predicted, count) cells plus the per-cell accuracy flag
    in integer e4 (a cell is 10000 when labeled = predicted, 0
    otherwise — kept as the SQL expression so the oracle replays the
    same arithmetic). One groupBy over the map-only prediction pass;
    the pattern every quality/toxicity/langid classifier eval at
    100 TB follows (predictions never leave the executor, only the
    k×k confusion cells shuffle)."""
    from flink_1_16_0_src_spark.pipeline.text import language_id

    d = load(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("labeled"), language_id("text").alias("predicted")
    )
    return pred.groupBy("labeled", "predicted").agg(
        F.count("*").alias("n"),
        (
            F.floor(
                F.sum(F.when(F.col("labeled") == F.col("predicted"), 1).otherwise(0))
                * 10000 / F.count("*")
            )
        ).cast("bigint").alias("acc_e4"),
    )


@query(
    "text_perplexity_buckets",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang, str_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, len(t) - 1 AS nb,
             CAST(list_sum(list_transform(generate_series(1, len(t) - 1),
               i -> ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 15))::BIGINT % 6000000 + 500000)) AS BIGINT) AS total
      FROM toks WHERE len(t) >= 2
    ),
    binned AS (
      SELECT doc_id, lang, CAST(total // nb AS BIGINT) AS ppl_micro,
             CAST((total // nb) - ((total // nb) % 10000) AS BIGINT) AS bin
      FROM scored
    ),
    hist AS (SELECT lang, bin, count(*) AS cnt FROM binned GROUP BY 1, 2),
    cum AS (
      SELECT lang, bin,
             sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY lang) AS n
      FROM hist
    ),
    edges AS (
      SELECT lang,
             min(CASE WHEN 10 * cum >= 3 * n THEN bin END) AS head_edge,
             min(CASE WHEN 20 * cum >= 13 * n THEN bin END) AS mid_edge
      FROM cum GROUP BY lang
    )
    SELECT b.doc_id, b.lang, b.ppl_micro,
           CASE WHEN b.bin <= e.head_edge THEN 'head'
                WHEN b.bin <= e.mid_edge THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM binned b JOIN edges e USING (lang)
    """,
    tags=("pipeline", "text", "custom-op"),
)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet quality bucketing (Wenzek et al. 2019 §4.3): per-language
    perplexity percentiles split the corpus into head (best 30%),
    middle (next 35%) and tail — the canonical LM-filtered curation
    split. Perplexity is the deterministic hash-LM proxy
    (pipeline.text.hash_lm_ppl_micro — a documented stub for a KenLM
    broadcast table; exact integer micro-nats).

    Scale shape: the percentile EDGES come from a per-(lang, 10k-bin)
    HISTOGRAM — one groupBy to a few thousand cells, a window over that
    tiny frame, a broadcast join back (the text_length_percentiles /
    sketch_histogram_quantiles pattern). No corpus-sized window, no
    per-lang global sort; the scoring pass itself is map-only."""
    from flink_1_16_0_src_spark.pipeline.text import perplexity_buckets

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return perplexity_buckets(d)


@query(
    "text_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ), vocab AS (
      SELECT tok,
             CAST((('0x' || substr(md5(tok), 1, 15))::BIGINT % 2000001)
                  - 1000000 AS BIGINT) AS w
      FROM (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok)
      WHERE df >= 2
    ), m AS (
      SELECT t.doc_id, CAST(sum(v.w) AS BIGINT) AS margin_micro
      FROM toks t JOIN vocab v ON t.tok = v.tok
      GROUP BY t.doc_id
    )
    SELECT d.doc_id, d.lang,
           COALESCE(m.margin_micro, 0) AS margin_micro
    FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
    WHERE COALESCE(m.margin_micro, 0) >= 0
    """,
    tags=("pipeline", "text", "custom-op"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier gate (pipeline.text.
    quality_classifier_margin — the fastText-style CommonCrawl filter
    with a deterministic hash-stub weight table): per-doc integer
    micro-nat margin over a doc_freq-bounded broadcast vocab, keep
    margin >= 0. Exact integer margins, so the oracle replays the sum
    bit-for-bit; DuckDB sum(BIGINT) is HUGEINT — cast back."""
    from flink_1_16_0_src_spark.pipeline.text import quality_classifier_margin

    d = load(spark, sf_dir, "documents")
    m = quality_classifier_margin(d, "text", "doc_id")
    return (
        d.select("doc_id", "lang")
        .join(m, "doc_id")
        .where(F.col("margin_micro") >= 0)
        .select("doc_id", "lang", "margin_micro")
    )


@query(
    "lm_bigram_table",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS} AS t FROM documents),
    pairs AS (
      SELECT b[1] AS w1, b[2] AS w2
      FROM (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> [t[i], t[i + 1]])) AS b
        FROM toks WHERE len(t) >= 2
      )
    ),
    c AS (SELECT w1, w2, count(*) AS n_bigram FROM pairs GROUP BY 1, 2),
    ctx AS (SELECT w1, sum(n_bigram) AS n_context FROM c GROUP BY 1),
    v AS (
      SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
    )
    SELECT c.w1, c.w2,
           CAST(c.n_bigram AS BIGINT) AS n_bigram,
           CAST(ctx.n_context AS BIGINT) AS n_context,
           CAST(((c.n_bigram + 1) * 1000000) // (ctx.n_context + (SELECT v FROM v))
                AS BIGINT) AS prob_e6
    FROM c JOIN ctx ON c.w1 = ctx.w1
    WHERE c.n_bigram >= 3
    """,
    tags=("pipeline", "text", "custom-op"),
)
def lm_bigram_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM training table (pipeline.text.bigram_lm_table):
    add-1-smoothed counts with exact integer e6 probabilities —
    context totals re-aggregate the bigram counts instead of
    re-scanning the corpus. The broadcast-ready complement of the
    hash-LM scorer."""
    from flink_1_16_0_src_spark.pipeline.text import bigram_lm_table

    return bigram_lm_table(load(spark, sf_dir, "documents"), "text")


@query(
    "text_ngram_diversity",
    oracle=f"""
    WITH pairs AS (
      SELECT source, b[1] || ' ' || b[2] AS bigram
      FROM (
        SELECT source, unnest(list_transform(range(1, len({_TOKS})),
                                             i -> [{_TOKS}[i], {_TOKS}[i + 1]])) AS b
        FROM documents WHERE len({_TOKS}) >= 2
      )
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(count(DISTINCT bigram) AS BIGINT) AS n_distinct,
           CAST((20000 * count(DISTINCT bigram) + count(*))
                // (2 * count(*)) AS BIGINT) AS diversity_e4
    FROM pairs GROUP BY source
    """,
    tags=("pipeline", "text", "custom-op"),
)
def text_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity report (the distinct-n-gram ratio used to
    detect templated/boilerplate-heavy sources before training — the
    corpus-level cousin of the per-doc repetition gates): per source,
    total and distinct bigram counts plus the distinct ratio in exact
    half-up e4 integer units (no float ratio on the hashed surface).
    One explode + one aggregation; at 100 TB the distinct count is the
    only wide state and shards by (source, bigram) hash."""
    d = load(spark, sf_dir, "documents")
    # hoist the token array to a materialized column: interpreted HOFs
    # get no CSE for repeated non-attribute subtrees, so inlining the
    # split into the bigram lambda would re-split the text once per
    # bigram (O(tokens^2) per doc — the hash_lm_ppl_micro lesson)
    toked = d.select(
        "source", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("__t")
    )
    pairs = toked.select(
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(__t) >= 2 THEN "
                "transform(sequence(1, size(__t) - 1),"
                " i -> concat_ws(' ', element_at(__t, i),"
                "                element_at(__t, i + 1)))"
                " ELSE array() END"
            )
        ).alias("bigram"),
    )
    agg = pairs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.countDistinct("bigram").cast("bigint").alias("n_distinct"),
    )
    # exact half-up integer division — a float quotient cast to bigint
    # can flip at boundaries between engines
    return agg.select(
        "source", "n_bigrams", "n_distinct",
        F.expr("(20000 * n_distinct + n_bigrams) DIV (2 * n_bigrams)")
        .cast("bigint").alias("diversity_e4"),
    )


@query(
    "vocab_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(str_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok,
               row_number() OVER (ORDER BY count(*) DESC, tok) AS r
        FROM toks GROUP BY tok
      ) WHERE r <= 200
    )
    SELECT t.lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE v.tok IS NULL) AS BIGINT) AS n_oov,
           CAST(count(*) FILTER (WHERE v.tok IS NULL) * 1000000
                // count(*) AS BIGINT) AS oov_ppm
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.lang
    """,
    tags=("pipeline", "text", "vocab"),
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage report: per-language OOV share against the
    corpus's own top-200 vocabulary — the go/no-go check before
    freezing a tokenizer for a multilingual mix (a lang whose OOV rate
    spikes is under-served by the vocab). Two passes over the exploded
    token stream (vocab head, then a BROADCAST left anti-ish probe —
    the 200-row vocab broadcasts, the corpus never shuffles for the
    join) and one k-row groupBy(lang). OOV share emitted as integer
    parts-per-million (BIGINT floor-div, engine-exact — no double
    division on the hashed surface)."""
    from flink_1_16_0_src_spark.pipeline.text import tokens

    d = load(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(tokens("text")).alias("tok"))
    vocab = (
        toks.groupBy("tok").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(200)
        .select("tok", F.lit(True).alias("__in_vocab"))
    )
    probed = toks.join(F.broadcast(vocab), "tok", "left")
    return (
        probed.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_oov"),
        )
        .select(
            "lang", "n_tokens", "n_oov",
            # integral DIV, not double-divide-then-cast: the latter can
            # land one ulp under an exact quotient and floor one lower
            # than DuckDB's BIGINT //
            F.expr("n_oov * 1000000L div n_tokens").alias("oov_ppm"),
        )
    )


@query(
    "text_tokenizer_fertility",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(text)) AS BIGINT) AS n_chars,
           CAST(sum(len({_TOKS})) AS BIGINT) AS n_words,
           CAST(sum(len(text) // 4 + len({_TOKS})) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(len(text) // 4 + len({_TOKS})) * 1000000
                // sum(len({_TOKS})) AS BIGINT) AS fertility_ppm,
           CAST(sum(len(text)) * 1000000
                // sum(len(text) // 4 + len({_TOKS})) AS BIGINT)
             AS chars_per_token_ppm
    FROM documents
    GROUP BY source
    """,
    tags=("pipeline", "text", "custom-op"),
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility / compression census
    (pipeline.text.tokenizer_fertility — r11): BPE-estimate tokens per
    whitespace word and chars per BPE token, both as integral ppm —
    the tokenizer-fit report multilingual pipelines run per source or
    language before fixing a vocab. One scan, one |sources|-row
    aggregation, integer arithmetic end-to-end (repo float rule)."""
    from flink_1_16_0_src_spark.pipeline.text import tokenizer_fertility

    d = load(spark, sf_dir, "documents")
    return tokenizer_fertility(d, "text", "source")


@query(
    "text_source_tv_drift",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(str_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS c FROM tok GROUP BY tok
        ORDER BY c DESC, tok LIMIT 200
      )
    ),
    cnts AS (
      SELECT t.source, t.tok, CAST(count(*) AS BIGINT) AS cnt
      FROM tok t JOIN vocab v USING (tok)
      GROUP BY t.source, t.tok
    ),
    totals AS (
      SELECT source, CAST(sum(cnt) AS BIGINT) AS total
      FROM cnts GROUP BY source
    ),
    grid AS (SELECT s.source, s.total, v.tok FROM totals s CROSS JOIN vocab v),
    filled AS (
      SELECT g.source, g.total, g.tok, COALESCE(c.cnt, 0) AS cnt
      FROM grid g LEFT JOIN cnts c ON c.source = g.source AND c.tok = g.tok
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(sum(abs(a.cnt * b.total - b.cnt * a.total)) AS BIGINT) AS tv_num,
           a.total AS total_a, b.total AS total_b
    FROM filled a JOIN filled b ON a.tok = b.tok AND a.source < b.source
    GROUP BY a.source, b.source, a.total, b.total
    """,
    tags=("pipeline", "text", "custom-op"),
)
def text_source_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture drift report (r12 —
    pipeline.text.source_distribution_drift): pairwise total-variation
    distance between per-source unigram distributions over the global
    top-200 vocabulary, as the EXACT cross-multiplied integer numerator
    (tv = tv_num / (2 * total_a * total_b)) so the value hash is
    summation-order-proof. Vocabulary broadcasts; the pair stage runs
    on the sources x vocab grid, never the corpus."""
    from flink_1_16_0_src_spark.pipeline.text import source_distribution_drift

    d = load(spark, sf_dir, "documents")
    return source_distribution_drift(d, "text", "source", top_n=200)
