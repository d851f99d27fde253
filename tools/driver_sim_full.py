"""Full driver-protocol simulation: every registered query vs its DuckDB
oracle at sf0.01 (the verify skill's loop, all names). Writes one JSON
line per query to the output path as it goes so progress is observable.

Usage: python tools/driver_sim_full.py [out.jsonl] [name-prefix ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from flink_1_16_0_src_spark.session import get_spark
from flink_1_16_0_src_spark.oracle import compare_frames, duckdb_connection


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/driver_sim_full.jsonl"
    prefixes = tuple(sys.argv[2:])
    spark = get_spark("driver-sim-full")
    qs, osql = e.queries(), e.oracle_sql()
    sf = "/root/testdata/sf0.01"
    con = duckdb_connection(sf)
    n_fail = 0
    with open(out_path, "w") as fh:
        for name, fn in qs.items():
            if prefixes and not name.startswith(prefixes):
                continue
            t0 = time.perf_counter()
            try:
                sdf = fn(spark, sf).toPandas()
                probs = (
                    compare_frames(sdf, con.execute(osql[name]).fetchdf())
                    if name in osql
                    else ["no_oracle"]
                )
            except Exception as ex:  # noqa: BLE001
                probs = [f"EXC: {type(ex).__name__}: {ex}"[:500]]
            dt = round(time.perf_counter() - t0, 2)
            rec = {"name": name, "sec": dt, "problems": probs or None}
            if probs:
                n_fail += 1
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
    print(json.dumps({"failures": n_fail}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
