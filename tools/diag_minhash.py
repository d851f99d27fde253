"""Stage-level timing for dedup_minhash_lsh at two scales (VERDICT r7
task #2: diagnose the 15.9x/decade scale-probe growth).

Breaks minhash_dedup_pairs into its three stages — signature agg /
candidate join / verify join — and times each at sf0.1 and at the 10x
probe corpus, recording the candidate-pair count and LSH bucket-size
profile at both scales, plus the persist_banded=DISK_ONLY variant of
the candidate stage.

Usage: python tools/diag_minhash.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from flink_1_16_0_src_spark.pipeline.dedup import (
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
)
from flink_1_16_0_src_spark.queries.pipeline_dedup import _dup_corpus
from flink_1_16_0_src_spark.session import get_spark


def diag(spark, sf_dir: str, persist_banded=None) -> dict:
    out: dict = {"sf_dir": sf_dir, "persist_banded": str(persist_banded)}
    n = spark.sparkContext.defaultParallelism
    df = (
        _dup_corpus(spark, sf_dir)
        .select("doc_id", "text")
        .repartition(n, F.col("doc_id"))
        .persist()
    )
    out["docs"] = df.count()

    t0 = time.perf_counter()
    sigs = minhash_signatures(df, "text", "doc_id", 16, 3).persist()
    sigs.count()
    out["sig_sec"] = round(time.perf_counter() - t0, 2)

    # bucket profile (diagnostic only — one extra pass over sigs)
    rows_per_band = 16 // 4
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh{p}").cast("string")
                            for p in range(b * rows_per_band, (b + 1) * rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(4)
        ]
    )
    banded = sigs.select(F.col("doc_id"), F.explode(band_structs).alias("__b")).select(
        "doc_id", F.col("__b.band").alias("band"), F.col("__b.band_hash").alias("band_hash")
    )
    prof = (
        banded.groupBy("band", "band_hash")
        .count()
        .agg(
            F.count("*").alias("buckets"),
            F.max("count").alias("max_bucket"),
            F.sum(F.when(F.col("count") > 1, F.col("count") * (F.col("count") - 1) / 2)).alias(
                "allpairs_bound"
            ),
            F.sum(F.when(F.col("count") > 1000, 1).otherwise(0)).alias("hot_buckets"),
        )
        .collect()[0]
    )
    out["buckets"] = prof["buckets"]
    out["max_bucket"] = prof["max_bucket"]
    out["allpairs_bound"] = int(prof["allpairs_bound"] or 0)
    out["hot_buckets"] = prof["hot_buckets"]

    t0 = time.perf_counter()
    cands = lsh_candidate_pairs(
        sigs, "doc_id", 16, 4, 1000, persist_banded=persist_banded
    ).persist()
    out["cand_pairs"] = cands.count()
    out["cand_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["verified_pairs"] = jaccard_verify(df, cands, "text", "doc_id", 0.6, 3).count()
    out["verify_sec"] = round(time.perf_counter() - t0, 2)

    out["total_sec"] = round(out["sig_sec"] + out["cand_sec"] + out["verify_sec"], 2)
    df.unpersist()
    sigs.unpersist()
    cands.unpersist()
    spark.catalog.clearCache()
    return out


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/spark_graft_scale_probe/sf1"]
    spark = get_spark("diag-minhash")
    for d in dirs:
        for pb in (None, StorageLevel.DISK_ONLY):
            print(json.dumps(diag(spark, d, pb)), flush=True)
