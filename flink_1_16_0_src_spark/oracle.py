"""DuckDB oracle comparison harness (FIXTURES.md 'Oracle protocol').

Mimics the driver's check: run the Spark query and the DuckDB oracle
SQL over identical parquet, canonicalize (columns sorted by name, rows
sorted, doubles rounded per tolerance — the reference's comparator idea,
flink-end-to-end-tests/flink-tpcds-test/.../TpcdsResultComparator.java:246),
then compare as multisets.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

from flink_1_16_0_src_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canonicalize(pdf: pd.DataFrame, float_decimals: int = 4) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = np.round(s.astype("float64"), float_decimals)
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif s.dtype == object:
            # lists (array columns) → tuples so they sort/compare
            if s.map(lambda v: isinstance(v, (list, np.ndarray))).any():
                pdf[c] = s.map(
                    lambda v: tuple(np.asarray(v).tolist()) if v is not None else None
                )
            else:
                from decimal import Decimal

                if s.map(lambda v: isinstance(v, Decimal)).any():
                    pdf[c] = np.round(s.astype("float64"), float_decimals)
    sort_cols = list(pdf.columns)
    if sort_cols:
        pdf = pdf.sort_values(sort_cols, na_position="first", kind="mergesort")
    return pdf.reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, atol: float = 1e-3) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if len(a) != len(b):
        problems.append(f"row count: spark={len(a)} oracle={len(b)}")
    if list(a.columns) != list(b.columns):
        problems.append(f"columns: spark={list(a.columns)} oracle={list(b.columns)}")
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            bad = ~(
                np.isclose(av.astype(float), bv.astype(float), atol=atol, equal_nan=True)
            )
        else:
            bad = np.array([not _eq(x, y) for x, y in zip(av, bv)])
        if bad.any():
            i = int(np.argmax(bad))
            problems.append(
                f"column {c}: {int(bad.sum())}/{len(bad)} differ; first at row {i}: "
                f"spark={av[i]!r} oracle={bv[i]!r}"
            )
    return problems


def _eq(x, y) -> bool:
    try:
        if pd.isna(x) is True and pd.isna(y) is True:
            return True
    except (TypeError, ValueError):
        pass
    try:
        return bool(x == y)
    except (TypeError, ValueError):
        return False
