"""Profile a streaming drain: run the query once and dump per-batch
StreamingQueryProgress durations (addBatch/getBatch/commitOffsets/
walCommit/queryPlanning/triggerExecution) plus total wall, so the
drain's cost splits into startup vs per-micro-batch vs state commit.

Usage: python tools/stream_profile.py <query_name> [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_1_16_0_src_spark.registry import all_queries  # noqa: E402
from flink_1_16_0_src_spark.session import get_spark  # noqa: E402
from flink_1_16_0_src_spark.streaming import sources as ssrc  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stream-profile")

    progress: list[dict] = []
    orig = ssrc.run_to_memory

    def patched(sdf, qname, output_mode="append"):
        t0 = time.perf_counter()
        q = (
            sdf.writeStream.format("memory")
            .queryName(qname)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        t_started = time.perf_counter()
        q.awaitTermination()
        t_done = time.perf_counter()
        for p in q.recentProgress:
            progress.append(
                {
                    "batchId": p["batchId"],
                    "numInputRows": p["numInputRows"],
                    "durationMs": p["durationMs"],
                    "stateOperators": [
                        {
                            k: so.get(k)
                            for k in (
                                "operatorName",
                                "numRowsTotal",
                                "numRowsUpdated",
                                "commitTimeMs",
                                "numShufflePartitions",
                            )
                        }
                        for so in p.get("stateOperators", [])
                    ],
                }
            )
        progress.append(
            {
                "_start_call_sec": round(t_started - t0, 3),
                "_await_sec": round(t_done - t_started, 3),
            }
        )
        return sdf.sparkSession.sql(f"SELECT * FROM {qname}")

    ssrc.run_to_memory = patched
    registry = all_queries()
    # warm-up then timed, mirroring bench methodology
    for run in range(2):
        progress.append({"_run": run})
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).count()
        progress.append({"_total_sec": round(time.perf_counter() - t0, 3)})
    ssrc.run_to_memory = orig
    print(json.dumps(progress, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
