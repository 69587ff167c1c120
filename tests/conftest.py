"""Shared pytest fixtures: one local SparkSession for the whole run."""

from __future__ import annotations

import os
import sys

import pytest

# Make the repo root importable regardless of pytest invocation dir.
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from convert_parquet_to_csv_spark import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_MED = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="cptc-spark-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "4g",
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med() -> str:
    return SF_MED


@pytest.fixture(scope="session")
def sf_big() -> str:
    """sf0.1 — the bench-scale fixture; skip tests that need it if the
    driver did not generate it this round."""
    path = os.path.join(TESTDATA, "sf0.1")
    if not os.path.isdir(path):
        pytest.skip("sf0.1 fixture not present")
    return path
