"""k-means clustering tests (pipeline extra — Lloyd iterations over
the IVF coarse quantizer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_16_0_src_spark import tables
from flink_1_16_0_src_spark.pipeline.cluster import inertia, kmeans
from flink_1_16_0_src_spark.pipeline.similarity import ivf_assign

SF_DIR = "/root/testdata/sf0.001"


def test_kmeans_inertia_non_increasing(spark):
    emb = tables.load(spark, SF_DIR, "embeddings")
    seed_rows = emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    seeds = [list(map(float, r[1])) for r in sorted(seed_rows, key=lambda r: r[0])]
    i0 = inertia(ivf_assign(emb, "embedding", "vec_id", seeds), "embedding", seeds)

    assigned1, cents1 = kmeans(emb, "embedding", "vec_id", k=8, iters=1)
    i1 = inertia(assigned1.join(emb.select("vec_id"), "vec_id"), "embedding", cents1)
    assigned3, cents3 = kmeans(emb, "embedding", "vec_id", k=8, iters=3)
    i3 = inertia(assigned3, "embedding", cents3)

    assert i1 <= i0 * (1 + 1e-9)
    assert i3 <= i1 * (1 + 1e-9)
    assert assigned3.count() == emb.count()
    # every cell id is a valid [0, k) label
    cells = [r.cell for r in assigned3.select("cell").distinct().collect()]
    assert all(0 <= c < 8 for c in cells)
