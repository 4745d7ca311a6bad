"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship continuous-aggregate query on
sf0.001; ``queries()``/``oracle_sql()`` expose the SURVEY.md §2 operator
battery checked against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gents_spark.driver_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the raw->1m continuous aggregate (SURVEY.md §7.1 M0)
    on /root/testdata/sf0.001."""
    return QUERIES["rollup_1m"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(ORACLES)
