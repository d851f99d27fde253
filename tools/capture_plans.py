"""Capture .explain('formatted') for named registry queries into
plans/$SPARK_GRAFT_PLANS_TAG (default r13)/<name>_<tag>.txt (judge evidence for plan claims).

Usage: python tools/capture_plans.py <tag> <name> [<name> ...]
       python tools/capture_plans.py <tag> BENCH      # all bench queries
Streaming drains are EXECUTED by their query functions (the returned
frame is the drained memory table), so for stream_* names the captured
plan is the batch plan of the drained result — the streaming plan is
profiled separately (tools/stream_profile.py).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from flink_1_16_0_src_spark.registry import all_queries
    from flink_1_16_0_src_spark.session import get_spark

    if names == ["BENCH"]:
        import bench

        names = list(bench.BENCH_QUERIES)
    spark = get_spark("plan-capture")
    registry = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_TAG", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = registry[n].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{n}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", n)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
