"""Heavy-hitters sketch tests (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_misra_gries_partials_bounded(spark):
    from flink_1_16_0_src_spark.operators.sketch import _misra_gries_partials

    df = spark.range(0, 20_000).select((F.col("id") % 999).alias("k")).repartition(8)
    parts = _misra_gries_partials(df, "k", capacity=16)
    # ≤ capacity counters per partition
    assert parts.count() <= 16 * 8


def test_heavy_hitters_exact_under_skew(spark):
    """Skewed corpus (3 heavy keys over a 5000-key uniform tail): the
    two-pass sketch with small capacity still returns the EXACT top-3 —
    the pigeonhole candidate guarantee in action."""
    from flink_1_16_0_src_spark.operators.sketch import approx_top_k

    heavy = spark.range(0, 9_000).select(
        (F.col("id") % 3).alias("k")  # keys 0,1,2: 3000 each
    )
    tail = spark.range(0, 5_000).select((F.col("id") + 100).alias("k"))  # 1 each
    df = heavy.unionAll(tail).repartition(16)
    got = [(r.k, r.cnt) for r in approx_top_k(df, "k", k=3, capacity=64).orderBy("rank_num").collect()]
    assert got == [(0, 3000), (1, 3000), (2, 3000)]
