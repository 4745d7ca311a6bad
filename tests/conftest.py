"""Shared Spark fixture — one local session for the whole test run."""

from __future__ import annotations

import pytest

from gents_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        app_name="gents_spark-tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "6g",
            "spark.sql.warehouse.dir": "/tmp/gents-spark-warehouse",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
