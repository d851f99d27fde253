"""User-defined function surface (SURVEY.md §2.12).

Reference parity — PyFlink's udf/udtf/udaf decorators
(flink-python/pyflink/table/udf.py:372-377, func_type='general' |
'pandas') re-expressed over native PySpark UDF machinery. Since this
engine is Python-first, PySpark's own surface IS the product; these
wrappers keep the Flink spelling working:

- ``udf(result_type, func_type)``: 'general' → row-at-a-time
  ``F.udf`` (documented slow path); 'pandas' → Arrow-batched
  ``pandas_udf`` (ScalarFunction parity, T-COMMON/functions/
  ScalarFunction.java).
- ``udtf(result_type)``: Python UDTF emitting multiple rows per call
  (TableFunction.java parity; Spark 3.5+ native UDTF).
- ``udaf(result_type)``: grouped-agg pandas UDF
  (AggregateFunction.java parity — accumulator fold over a group;
  ``retract()`` has no Spark analog, update-stream retraction is
  handled by the stateful ops instead, SURVEY.md §7.3).
- ``register(spark, name, fn)``: CREATE FUNCTION / spark.udf parity
  (flink-sql-parser ddl/SqlCreateFunction.java).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def udf(result_type: str, func_type: str = "general") -> Callable:
    """Scalar UDF decorator. func_type='pandas' → Arrow-vectorized."""

    def deco(fn):
        if func_type == "pandas":
            return F.pandas_udf(result_type)(fn)
        return F.udf(fn, result_type)

    return deco


def udtf(result_type: str) -> Callable:
    """Table function: ``fn(*args)`` yields tuples; use via
    ``F.udtf``-style lateral join or ``.select(explode(...))`` when the
    function returns arrays. Wraps Spark's native Python UDTF."""

    def deco(cls_or_fn):
        if isinstance(cls_or_fn, type):
            return F.udtf(cls_or_fn, returnType=result_type)

        class _Gen:
            def eval(self, *args):
                yield from cls_or_fn(*args)

        _Gen.__name__ = getattr(cls_or_fn, "__name__", "udtf")
        return F.udtf(_Gen, returnType=result_type)

    return deco


def udaf(result_type: str) -> Callable:
    """Aggregate UDF over pandas Series per group (GROUPED_AGG)."""

    def deco(fn):
        return F.pandas_udf(result_type, F.PandasUDFType.GROUPED_AGG)(fn)

    return deco


def udtaf(result_type: str) -> Callable:
    """Table AGGREGATE function decorator (pyflink ``udtaf``,
    TableAggregateFunction.java): decorate a class with
    ``create_accumulator() -> acc``, ``accumulate(acc, row)`` and
    ``emit_value(acc) -> iterable[dict]`` methods; the result is a
    callable ``(df, keys) -> DataFrame`` that runs the accumulator per
    key via the DataStream ``flat_aggregate`` contract (multi-row
    emission per group)."""

    def deco(cls):
        def apply(df, keys: list[str]):
            from flink_1_16_0_src_spark.datastream import DataStream

            inst = cls()
            return (
                DataStream(df)
                .key_by(*keys)
                .flat_aggregate(
                    inst.create_accumulator, inst.accumulate, inst.emit_value,
                    result_type,
                )
                .df
            )

        apply.__name__ = cls.__name__
        apply._udtaf_class = cls
        return apply

    return deco


def register(spark: SparkSession, name: str, fn) -> None:
    """CREATE FUNCTION parity: makes the UDF callable from SQL."""
    try:
        spark.udtf.register(name, fn)  # Python UDTFs register separately
    except Exception:
        spark.udf.register(name, fn)
