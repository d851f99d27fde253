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
