"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over ``flink_1_16_0_src_spark.registry`` — every operator
family from SURVEY.md §2 registers its queries + DuckDB oracles there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q6 shape) on /root/testdata/sf0.001."""
    from flink_1_16_0_src_spark.registry import all_queries

    return all_queries()["agg_q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flink_1_16_0_src_spark.registry import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from flink_1_16_0_src_spark.registry import all_queries

    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
