"""The conformance matrix: every registered query with an oracle is
hash-compared against DuckDB at sf0.001 (the driver repeats this at
sf0.01). Mirrors the reference's ITCase strategy (SURVEY.md §5.3)."""

from __future__ import annotations

import pytest

from flink_1_16_0_src_spark.oracle import compare_frames
from flink_1_16_0_src_spark.registry import all_queries

_ALL = all_queries()


@pytest.mark.parametrize("name", sorted(_ALL))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    spec = _ALL[name]
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only smoke; dedicated tests cover semantics
        return
    oracle_pdf = oracle_con.execute(spec.oracle).fetchdf()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)
