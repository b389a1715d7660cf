"""Shared test fixtures: one session-scoped SparkSession (local mode)."""

from __future__ import annotations

import pytest

from minispark_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "minispark_spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.sql.warehouse.dir": "/tmp/ms-warehouse"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
