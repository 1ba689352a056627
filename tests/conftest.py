"""Shared pytest fixtures: one session-scoped local SparkSession.

Mirrors the reference's test fixture style (local master, small shuffle
parallelism — tests/test_transformer.py:18-26) but via the engine's own
session factory so test plans run under the same AQE/UTC config as
production.
"""

from __future__ import annotations

import pytest

from covid19_etl_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
