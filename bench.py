#!/usr/bin/env python
"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.

Each query is executed twice: a warm-up that also triggers JIT/codegen
and a timed run. The timed number is end-to-end (plan + execute +
collect-to-count), which is what a user of the engine experiences.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

BENCH_QUERIES = [
    # name in registry — keep these the heavy, representative ones
    "agg_q1_pricing_summary",
    "agg_q6_forecast_revenue",
    "agg_distinct",
    "agg_grouping_sets",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flink_1_16_0_src_spark.registry import all_queries
    from flink_1_16_0_src_spark.session import get_spark

    spark = get_spark("bench")
    registry = all_queries()
    names = [n for n in BENCH_QUERIES if n in registry]
    # warm-up: JVM/codegen + parquet footer caches
    for n in names:
        registry[n].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for n in names:
        t0 = time.perf_counter()
        registry[n].fn(spark, sf_dir).count()
        timings[n] = round(time.perf_counter() - t0, 4)

    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
