from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from flink_1_16_0_src_spark.session import get_spark

    spark = get_spark("tests", cpus="8")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    from flink_1_16_0_src_spark.oracle import duckdb_connection

    return duckdb_connection(sf_dir)
