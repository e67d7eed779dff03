"""Shared fixtures: one SparkSession per test session, testdata locations."""

from __future__ import annotations

import os

import pytest

from dca_manager_spark.session import get_session

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_CORRECTNESS = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_session(app_name="dca-manager-spark-tests", master="local[4]",
                        shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
