"""Query registry — the single inventory behind the driver contract.

Every operator family from SURVEY.md §2 registers named queries here.
Each entry pairs a PySpark builder ``fn(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB-dialect ``oracle`` SQL string (or ``None``
for ops not expressible in ANSI SQL — the driver then records a weaker
rows-only check). ``__spark_entry__.queries()/oracle_sql()`` and the
pytest oracle harness both iterate this registry.

Conventions (driver hash-compare requires them):
- alias every computed/aggregate column identically on both sides;
- round float aggregates to a fixed decimal on BOTH sides so
  summation-order ULP noise cannot flip the driver's value hash;
- cast integer sums to BIGINT in DuckDB (its SUM(int) yields HUGEINT).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    tags: tuple = ()
    doc: str = field(default="")


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str] = None, tags: tuple = ()):
    """Decorator registering a query builder under ``name``."""

    def deco(fn):
        assert name not in QUERIES, f"duplicate query name {name}"
        QUERIES[name] = QuerySpec(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import for side effect: modules register themselves
    from flink_1_16_0_src_spark import queries as _q  # noqa: F401

    return QUERIES
