"""Time a subset of bench queries with the bench.py methodology
(warm-up + min-of-2 + reclaim + interleaved canary) without running
the whole suite. Usage: python tools/bench_subset.py name [name ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _canary_sec, _reclaim  # noqa: E402
from flink_1_16_0_src_spark.registry import all_queries
from flink_1_16_0_src_spark.session import get_spark


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-subset")
    registry = all_queries()
    out = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"bench-subset: {n}")
        registry[n].fn(spark, sf_dir).count()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            registry[n].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        _reclaim(spark)
        out[n] = {"sec": round(best, 4), "canary": _canary_sec()}
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
