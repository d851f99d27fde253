"""End-to-end training-data curation pipeline — the composition
headline: exact dedup → Gopher quality gate → benchmark
decontamination → deterministic sampling → sequence packing, one DAG
over the documents corpus, every stage the SAME operator the
standalone queries use. Proves the stages compose (a user runs the
whole curation flow, not five isolated queries) and that the composed
plan keeps each stage's scale contract: dedup is the only corpus-wide
shuffle on text, the gate is map-only, the decontam check joins a
broadcast gram set, the sample is a map-only filter, packing windows
run inside hash buckets.

Oracle: the stages' existing DuckDB twins composed as CTEs — dedup
fingerprint groupBy, integer cross-multiplied Gopher gate, 8-gram
bench hit set, md5 hash-unit filter, bucketed prefix-sum packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.registry import query
from flink_1_16_0_src_spark.tables import load

_TOKS = "str_split_regex(lower(trim(text)), '\\s+')"
_GRAMS8 = (
    f"list_distinct(list_transform(generate_series(1, greatest(len({_TOKS}) - 7, 0)),"
    f" i -> array_to_string({_TOKS}[i:i+7], ' ')))"
)
_UNIT = (
    "((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000)"
    " / 1000000.0)"
)
_STOPS = "['the','a','of','and','is','to','in']"


@query(
    "pipeline_e2e_curation",
    oracle=f"""
    WITH deduped AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    ),
    gated AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN deduped k USING (doc_id)
      WHERE len({_TOKS}) BETWEEN 50 AND 100000
        AND length(array_to_string({_TOKS}, ''))
              BETWEEN 3 * len({_TOKS}) AND 10 * len({_TOKS})
        AND 10 * len(list_filter({_TOKS}, w -> w = '#' OR w = '…'))
              <= len({_TOKS})
        AND 10 * len(list_filter({_TOKS}, w -> regexp_matches(w, '[a-z]')))
              >= 8 * len({_TOKS})
        AND len(list_intersect({_TOKS}, {_STOPS})) >= 2
    ),
    bench AS (
      SELECT DISTINCT unnest({_GRAMS8}) AS g FROM documents WHERE doc_id % 97 = 0
    ),
    hits AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, unnest({_GRAMS8}) AS g FROM gated AS d) t
      JOIN bench b ON t.g = b.g
    ),
    sampled AS (
      SELECT doc_id, text FROM gated
      WHERE doc_id NOT IN (SELECT doc_id FROM hits) AND {_UNIT} < 0.5
    ),
    staged AS (
      SELECT doc_id, len({_TOKS}) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8
                  AS INT) AS bucket
      FROM sampled
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
    tags=("pipeline", "e2e", "custom-op"),
)
def pipeline_e2e_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation DAG in one plan: (1) exact dedup (min-id per
    normalized-text fingerprint — the one corpus-text shuffle), (2) the
    Gopher quality gate (map-only integer cross-multiplications), (3)
    8-gram benchmark decontamination (bench docs = doc_id % 97, gram
    set broadcast, anti-join), (4) deterministic 50% hash-Bernoulli
    sample (map-only), (5) 2048-token sequence packing in 8 hash
    buckets (windows inside buckets only). Every stage is the same
    public operator its standalone query exercises."""
    from flink_1_16_0_src_spark.pipeline.decontam import contamination_hits
    from flink_1_16_0_src_spark.pipeline.dedup import exact_dedup, spread_input
    from flink_1_16_0_src_spark.pipeline.packing import pack_sequences
    from flink_1_16_0_src_spark.pipeline.sampling import hash_sample
    from flink_1_16_0_src_spark.pipeline.text import gopher_gate

    # spread_input at the DAG head: every downstream stage (fingerprint
    # groupBy, gate, gram explode, packing) otherwise inherits the
    # single input split of a small corpus and runs serially; no-op at
    # scale (see spread_input docstring)
    docs = spread_input(load(spark, sf_dir, "documents"))
    kept = exact_dedup(docs, "text", "doc_id").select("doc_id")

    # Stage order rework (r12, result-identical): the gram-explode side
    # of the decontamination anti-join does NOT need the dedup keep-join
    # or to precede the sample — a hit on a doc_id absent from the
    # anti-join's left side is a no-op, and the left side (gate ∧ sample
    # ∧ kept) is a subset of (gate ∧ sample). Computing hits from the
    # gate∧sample frame instead of gate∧kept (a) drops a SECOND full
    # fingerprint-aggregate subtree the planner re-derived for the
    # kept-join on the gram path (Catalyst has no CSE across DataFrame
    # reuse — the before plan scanned the corpus 5x), and (b) halves
    # the 8-gram explode volume by applying the deterministic 50%
    # hash-Bernoulli sample BEFORE the gram pass. Same five stages,
    # same operators, same output rows (oracle-pinned).
    pre = docs.where(gopher_gate("text"))
    cand = hash_sample(pre, "doc_id", 0.5)

    bench = docs.where(F.col("doc_id") % 97 == 0)
    hits = contamination_hits(cand, bench, "text", "doc_id", n=8)
    flagged = F.broadcast(
        hits.where(F.col("n_contaminated_ngrams") > 0).select("doc_id")
    )
    clean = cand.join(kept, "doc_id").join(flagged, "doc_id", "left_anti")
    return pack_sequences(clean, "text", "doc_id", budget=2048, n_buckets=8)
