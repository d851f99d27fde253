"""Property-based MinHash-LSH tests (hypothesis) — cross-implementation
oracle: the Spark pipeline's signatures and LSH candidate pairs are
recomputed in plain Python (hashlib.md5 + the same affine permutations)
and must agree exactly. Analog of the reference's operator-harness
property coverage (SURVEY.md §5.1)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_1_16_0_src_spark.pipeline.dedup import (
    _MERSENNE31,
    lsh_candidate_pairs,
    minhash_signatures,
)

WORDS = ["spark", "flink", "join", "scan", "sort", "hash", "window", "agg"]

doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=10).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=8)

NUM_PERM, BANDS, K = 8, 4, 3


def _py_shingles(text: str, k: int = K) -> set[str]:
    toks = text.lower().strip().split()
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _py_signature(text: str) -> list[int] | None:
    sh = _py_shingles(text)
    if not sh:
        return None  # groupBy over zero shingle rows drops the doc
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _MERSENNE31 for s in sh]
    return [
        min(((2 * p + 1) * h + p * 40503) % _MERSENNE31 for h in hs)
        for p in range(NUM_PERM)
    ]


def _py_band_hashes(sig: list[int]) -> list[str]:
    rows = NUM_PERM // BANDS
    return [
        hashlib.md5(",".join(str(v) for v in sig[b * rows : (b + 1) * rows]).encode()).hexdigest()
        for b in range(BANDS)
    ]


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=corpus_strategy)
def test_signatures_and_candidates_match_python_oracle(spark, corpus):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    sigs = minhash_signatures(df, "text", "doc_id", num_perm=NUM_PERM, k=K)
    got_sigs = {
        r["doc_id"]: [r[f"mh{p}"] for p in range(NUM_PERM)] for r in sigs.collect()
    }
    want_sigs = {
        i: s for i, t in enumerate(corpus) if (s := _py_signature(t)) is not None
    }
    assert got_sigs == want_sigs

    got_pairs = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", num_perm=NUM_PERM, bands=BANDS).collect()
    }
    ids = sorted(want_sigs)
    want_pairs = {
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if set(_py_band_hashes(want_sigs[a])) & set(_py_band_hashes(want_sigs[b]))
    }
    assert got_pairs == want_pairs


BITS = 16


def _py_simhash(text: str) -> int:
    import re

    # re.split matches Spark's split(): "" yields one empty token
    toks = re.split(r"\s+", text.lower().strip())
    votes = [0] * BITS
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for b in range(BITS):
            votes[b] += 1 if (h >> b) & 1 else -1
    return sum((1 << b) for b in range(BITS) if votes[b] > 0)


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=corpus_strategy)
def test_simhash_matches_python_oracle(spark, corpus):
    from flink_1_16_0_src_spark.pipeline.dedup import simhash

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {r.doc_id: r.simhash for r in simhash(df, "text", "doc_id", bits=BITS).collect()}
    want = {i: _py_simhash(t) for i, t in enumerate(corpus)}
    assert got == want


def test_hot_bucket_cap_keeps_candidates_linear(spark):
    """VERDICT r1 scale flag: a boilerplate-heavy corpus (here 1000
    identical docs) must NOT go quadratic in its hot LSH bucket. With
    the cap, candidate volume stays linear (star join to the bucket
    representative) and every duplicate remains connected to the
    cluster through the min-id rep (Jaccard vs rep = 1.0)."""
    n_dup, boiler = 1000, "the quick brown fox jumps over the lazy dog again"
    rows = [(i, boiler) for i in range(n_dup)]
    rows += [(10_000 + i, f"unique text number {i} with words {i * 7} {i * 13}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df, "text", "doc_id", num_perm=NUM_PERM, k=K)

    capped = lsh_candidate_pairs(sigs, "doc_id", NUM_PERM, BANDS, max_bucket=50)
    pairs = capped.collect()
    # linear, not ~n^2/2 = 499500: every band collapses to one star
    assert len(pairs) < 3 * n_dup
    # connectivity: all 999 non-rep duplicates link to rep doc_id=0
    linked = {r.id_b for r in pairs if r.id_a == 0}
    assert linked >= set(range(1, n_dup))

    # uncapped control on a small slice agrees with all-pairs semantics
    small = spark.createDataFrame(rows[:5] + rows[-3:], "doc_id long, text string")
    ssigs = minhash_signatures(small, "text", "doc_id", num_perm=NUM_PERM, k=K)
    uncapped = lsh_candidate_pairs(ssigs, "doc_id", NUM_PERM, BANDS, max_bucket=None)
    default = lsh_candidate_pairs(ssigs, "doc_id", NUM_PERM, BANDS)  # cap ≫ bucket
    assert sorted(map(tuple, uncapped.collect())) == sorted(map(tuple, default.collect()))


def test_connected_components_shapes(spark):
    """Chain, clique, and singleton-free graphs all converge to min-id
    labels; a chain exercises multi-round propagation (diameter > 1)."""
    from flink_1_16_0_src_spark.pipeline.dedup import connected_components, keep_canonical

    pairs = spark.createDataFrame(
        # chain 1-2-3-4-5 (diameter 4), clique {10,11,12}, pair {20,21}
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (10, 12), (11, 12),
         (20, 21)],
        "id_a long, id_b long",
    )
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 20, 21, 99]], "doc_id long")
    kept = sorted(r.doc_id for r in keep_canonical(docs, pairs, "doc_id").collect())
    assert kept == [1, 10, 20, 99]  # one per component + untouched 99


# -- exact substring spans (duplicate_spans / remove_duplicate_spans) ----

def _span_docs(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = [
        (1, f"one two three {shared} four five"),
        (2, f"start {shared} middle words here and more tail"),
        (3, "totally unique content with no repeats at all whatsoever"),
        (4, f"{shared} {shared}"),  # duplicated run twice in one doc
    ]
    return spark.createDataFrame(docs, "doc_id bigint, text string")


def test_duplicate_spans_finds_shared_run(spark):
    from flink_1_16_0_src_spark.pipeline.dedup import duplicate_spans

    df = _span_docs(spark)
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, "text", "doc_id", k=8).collect()
    }
    # doc 1: shared run is tokens [3, 11); doc 2: [1, 9)
    assert (1, 3, 11) in spans
    assert (2, 1, 9) in spans
    # doc 3 clean
    assert not any(s[0] == 3 for s in spans)
    # doc 4: the whole 16-token text is one merged island [0, 16)
    assert (4, 0, 16) in spans


def test_duplicate_spans_short_docs_no_windows(spark):
    from flink_1_16_0_src_spark.pipeline.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id bigint, text string"
    )
    assert duplicate_spans(df, "text", "doc_id", k=8).count() == 0


def test_remove_duplicate_spans_cuts_tokens(spark):
    from flink_1_16_0_src_spark.pipeline.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    df = _span_docs(spark)
    spans = duplicate_spans(df, "text", "doc_id", k=8)
    out = {r.doc_id: r.text for r in remove_duplicate_spans(df, spans, "text", "doc_id").collect()}
    assert out[1] == "one two three four five"
    assert out[2] == "start middle words here and more tail"
    assert out[3] == "totally unique content with no repeats at all whatsoever"
    assert out[4] == ""  # fully duplicated doc is cut to nothing


def test_duplicate_spans_islands_merge_overlaps(spark):
    """Two overlapping duplicated windows merge into ONE maximal span."""
    from flink_1_16_0_src_spark.pipeline.dedup import duplicate_spans

    nine = "a1 a2 a3 a4 a5 a6 a7 a8 a9"  # 9 tokens -> windows at pos 0 and 1
    df = spark.createDataFrame(
        [(1, f"x {nine} y"), (2, f"p q {nine}")],
        "doc_id bigint, text string",
    )
    rows = duplicate_spans(df, "text", "doc_id", k=8).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end, r.n_windows))
    assert per_doc[1] == [(1, 10, 2)]
    assert per_doc[2] == [(2, 11, 2)]


# -- property: duplicate_spans vs a pure-Python spans oracle -------------

span_doc = st.lists(st.sampled_from(WORDS[:4]), min_size=0, max_size=14).map(" ".join)
span_corpus = st.lists(span_doc, min_size=2, max_size=6)
SPAN_K = 3


def _py_spans(corpus: list[str], k: int = SPAN_K, min_docs: int = 2):
    wins = {}  # gram -> set(doc ids)
    toks = [d.lower().strip().split() for d in corpus]
    for i, t in enumerate(toks):
        for p in range(len(t) - k + 1):
            wins.setdefault(" ".join(t[p : p + k]), set()).add(i)
    dup = {g for g, ids in wins.items() if len(ids) >= min_docs}
    out = set()
    for i, t in enumerate(toks):
        hits = sorted(
            p for p in range(len(t) - k + 1) if " ".join(t[p : p + k]) in dup
        )
        spans, cur = [], None
        for p in hits:
            if cur is not None and p <= cur[1] + k:  # overlap-or-adjacent
                cur = (cur[0], p, cur[2] + 1)
            else:
                if cur is not None:
                    spans.append(cur)
                cur = (p, p, 1)
        if cur is not None:
            spans.append(cur)
        for s, e, n in spans:
            out.add((i, s, e + k, n))
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=span_corpus)
def test_duplicate_spans_match_python_oracle(spark, corpus):
    from flink_1_16_0_src_spark.pipeline.dedup import duplicate_spans

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id bigint, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicate_spans(df, "text", "doc_id", k=SPAN_K).collect()
    }
    assert got == _py_spans(corpus)


def test_ivf_assign_blas_matches_jvm(spark):
    """The mapInPandas BLAS quantizer (SemDeDup's assignment) must
    agree with the JVM ivf_assign contract on the fixture: same cell
    per vector (nearest seed over 6-dp-rounded squared L2, lowest cell
    wins ties) and the same rounded min distance."""
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark.pipeline.dedup import _ivf_assign_blas
    from flink_1_16_0_src_spark.pipeline.similarity import ivf_assign
    from flink_1_16_0_src_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    seed_rows = emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    seeds = [list(map(float, r[1])) for r in sorted(seed_rows, key=lambda r: r[0])]
    jvm = {
        r.vec_id: (r.cell, r.d)
        for r in ivf_assign(emb, "embedding", "vec_id", seeds).select(
            "vec_id", "cell",
            F.round(
                F.element_at(F.col("__dists"), F.col("cell") + F.lit(1)), 6
            ).alias("d"),
        ).collect()
    }
    blas = {
        r["vec_id"]: (r["cell"], r["__d"])
        for r in _ivf_assign_blas(emb, "embedding", "vec_id", seeds).collect()
    }
    assert set(jvm) == set(blas)
    mism = {k: (jvm[k], blas[k]) for k in jvm if jvm[k] != blas[k]}
    assert not mism, f"{len(mism)} mismatches, e.g. {list(mism.items())[:3]}"


def _skewed_embeddings(spark, n=400, dim=8):
    """~90% of vectors collapse into seed 0's cell (the near-duplicate
    blob a dedup corpus exists for), with injected scaled copies so
    real duplicate pairs exist inside AND across hash sub-blocks."""
    import numpy as np

    rng = np.random.RandomState(7)
    seeds = [[0.0] * dim, [100.0] * dim]
    vecs = []
    for i in range(n):
        center = np.asarray(seeds[0 if i % 10 else 1], dtype=np.float64)
        vecs.append(center + rng.normal(0.0, 1.0, dim))
    for i in range(3, n, 4):  # every 4th vector = scaled copy (cos ~ 1)
        vecs[i] = vecs[i - 1] * 1.0001
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id: bigint, embedding: array<double>")
    return df, seeds


def test_semantic_dedup_mega_cluster_blocked_matches_unblocked(spark):
    """VERDICT r8 "what's wrong" #1: one cell holding ~half the corpus
    must NOT become one executor's pandas frame. max_cell=32 forces the
    pair-of-blocks path; its survivor set must be identical to the
    unblocked single-group pass (the keep rule is block-invariant:
    every pair of cell members meets in exactly one block-pair group)."""
    from flink_1_16_0_src_spark.pipeline.dedup import semantic_dedup

    df, seeds = _skewed_embeddings(spark)
    blocked = semantic_dedup(df, "embedding", "vec_id", seeds, 0.9, max_cell=32)
    unblocked = semantic_dedup(
        df, "embedding", "vec_id", seeds, 0.9, max_cell=10**9
    )
    got = sorted((r.vec_id, r.cell) for r in blocked.collect())
    want = sorted((r.vec_id, r.cell) for r in unblocked.collect())
    assert got == want
    assert 0 < len(got) < 400  # duplicates were actually dropped


def test_semantic_dedup_block_groups_are_bounded(spark):
    """The per-group row count in the mega-cluster path is bounded by
    two hash sub-blocks — no (cell, gi, gj) group may approach the full
    mega-cell size, and every unordered pair of cell members must land
    in exactly one group (pair-complete, never double-compared)."""
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark.pipeline.dedup import (
        _ivf_assign_blas,
        _pair_block_groups,
    )

    df, seeds = _skewed_embeddings(spark)
    max_cell = 32
    base = _ivf_assign_blas(df, "embedding", "vec_id", seeds)
    grouped = _pair_block_groups(base, "vec_id", max_cell)
    sizes = (
        grouped.groupBy("cell", "__gi", "__gj")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    # two blocks of ~max_cell each, with binomial hash-imbalance slack
    assert sizes <= int(2.5 * max_cell), sizes
    # pair-completeness: each pair of same-cell members is COMPARED in
    # exactly one group. Co-occurrence is wider (same-block rows ride
    # every (b, j) group together), but the Arrow stage only compares
    # all-pairs in (b, b) groups and cross-block pairs in (i, j) —
    # mirror that comparison rule here.
    g = grouped.select("vec_id", "cell", "__gi", "__gj", "__blk")
    pairs = (
        g.alias("x")
        .join(g.alias("y"), ["cell", "__gi", "__gj"])
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .where(
            (F.col("__gi") == F.col("__gj"))
            | (F.col("x.__blk") != F.col("y.__blk"))
        )
        .groupBy(F.col("x.vec_id"), F.col("y.vec_id"))
        .count()
    )
    n_members = base.groupBy("cell").count().agg(
        F.sum(F.expr("count * (count - 1) / 2"))
    ).first()[0]
    assert pairs.where(F.col("count") != 1).count() == 0
    assert pairs.count() == int(n_members)


def test_simhash_incremental_band_join_exact_and_capped(spark):
    """simhash_dedup_against's pigeonhole band join is LOSSLESS: with no
    hot-bucket cap the banded candidates + hamming verify equal the
    full base x new hamming theta join; with a cap the result is a
    subset of the exact one (the documented star-cap recall price) and
    every surviving pair still verifies."""
    from pyspark.sql import functions as F

    from flink_1_16_0_src_spark import tables
    from flink_1_16_0_src_spark.pipeline.dedup import (
        simhash,
        simhash_dedup_against,
    )

    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    base = docs.where(F.col("doc_id") < 250)
    new = docs.where(F.col("doc_id") >= 250)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_dedup_against(
            new, base, "text", "doc_id", bits=32, max_hamming=2,
            max_bucket=None,
        ).collect()
    }
    sb = simhash(base, "text", "doc_id", 32).select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa")
    )
    sn = simhash(new, "text", "doc_id", 32).select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb")
    )
    exact = {
        (r.id_a, r.id_b, r.h)
        for r in sb.crossJoin(sn)
        .select(
            "id_a", "id_b",
            F.bit_count(F.expr("sa ^ sb")).cast("bigint").alias("h"),
        )
        .where(F.col("h") <= 2)
        .collect()
    }
    assert got == exact and len(exact) > 0
    capped = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_dedup_against(
            new, base, "text", "doc_id", bits=32, max_hamming=2,
            max_bucket=2,
        ).collect()
    }
    assert capped <= exact


def test_hamming_near_dup_pairs_lossless_vs_full_join(spark):
    """The generic pigeonhole band join (hamming_near_dup_pairs, r11)
    is EQUAL to the full all-pairs hamming join when uncapped: any
    pair within hamming <= max_hamming differs in at most max_hamming
    bits, which cannot touch every one of the max_hamming+1 bands.
    Random 56-bit signatures + planted near-twins; the capped variant
    returns a subset."""
    import itertools
    import random

    from flink_1_16_0_src_spark.pipeline.dedup import hamming_near_dup_pairs

    rng = random.Random(11)
    sigs = [(i, rng.getrandbits(56)) for i in range(120)]
    # planted twins: flip 1..4 random bits of existing signatures
    for j, (src, flips) in enumerate(
        [(3, 1), (17, 2), (40, 3), (77, 4), (90, 4)]
    ):
        v = sigs[src][1]
        for b in rng.sample(range(56), flips):
            v ^= 1 << b
        sigs.append((1000 + j, v))
    df = spark.createDataFrame(sigs, "id bigint, sig bigint")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_dup_pairs(
            df, "id", "sig", bits=56, max_hamming=4, max_bucket=None
        ).collect()
    )
    exp = sorted(
        (a, b, bin(sa ^ sb).count("1"))
        for (a, sa), (b, sb) in itertools.combinations(sigs, 2)
        if bin(sa ^ sb).count("1") <= 4
    )
    assert got == exp and len(exp) >= 5
    capped = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_dup_pairs(
            df, "id", "sig", bits=56, max_hamming=4, max_bucket=1
        ).collect()
    )
    assert set(capped) <= set(exp)


def test_hamming_near_dup_pairs_lossless_64bit_signed(spark):
    """ADVICE r11 #1 regression: full 64-bit signatures with the SIGN
    bit set (classic 64-bit SimHash stored as Spark bigint) must keep
    the pigeonhole guarantee. The old arithmetic shiftright + '%'
    extraction gave negative band values for negative sigs, so a
    negative-sig vs positive-sig near-twin straddling the sign bit was
    silently missed by the equi-join."""
    import itertools
    import random

    from flink_1_16_0_src_spark.pipeline.dedup import hamming_near_dup_pairs

    rng = random.Random(12)

    def signed(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    raw = [rng.getrandbits(64) | (1 << 63) if i % 2 else
           rng.getrandbits(63) for i in range(60)]
    # planted cross-sign twins: flip the SIGN bit plus 0..3 low bits —
    # exactly the pairs the signed extraction used to lose
    for j, (src, flips) in enumerate([(1, 0), (2, 1), (5, 2), (8, 3)]):
        v = raw[src] ^ (1 << 63)
        for b in rng.sample(range(63), flips):
            v ^= 1 << b
        raw.append(v)
    sigs = [(i, signed(v)) for i, v in enumerate(raw)]
    df = spark.createDataFrame(sigs, "id bigint, sig bigint")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_dup_pairs(
            df, "id", "sig", bits=64, max_hamming=4, max_bucket=None
        ).collect()
    )
    mask = (1 << 64) - 1
    exp = sorted(
        (a, b, bin((sa ^ sb) & mask).count("1"))
        for (a, sa), (b, sb) in itertools.combinations(sigs, 2)
        if bin((sa ^ sb) & mask).count("1") <= 4
    )
    assert got == exp and len(exp) >= 4
    # at least one expected pair actually crosses the sign boundary
    by_id = dict(sigs)
    assert any((by_id[a] < 0) != (by_id[b] < 0) for a, b, _ in exp)


def test_prefix_dedup_string_ids(spark):
    """ADVICE r11 #2 regression: prefix_dedup with a STRING id column
    (common for doc ids) must keep longest-then-min-id per prefix
    group. The old (−id) trick cast string ids to NULL under non-ANSI
    Spark and silently dropped the whole corpus."""
    from flink_1_16_0_src_spark.pipeline.dedup import prefix_dedup

    head = " ".join(f"w{i}" for i in range(6))
    rows = [
        ("doc_b", head + " tail tail tail"),   # longest in group → kept
        ("doc_a", head + " tail"),
        ("doc_c", head + " tail tail tail"),   # same len as doc_b, id > b
        ("doc_z", "something else entirely " * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    kept = sorted(
        r.doc_id
        for r in prefix_dedup(df, "text", "doc_id", n_tokens=6).collect()
    )
    assert kept == ["doc_b", "doc_z"]
