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
    language_id,
    quality_signals,
    token_count,
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
