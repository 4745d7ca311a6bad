"""Physical-plan shape assertions (SURVEY.md §4).

The optimizer guarantees the reference implements by hand (filter before
read, header-only scans) must appear in Catalyst's plans: predicate
pushdown into the parquet scan, column pruning, map-side partial
aggregation, broadcast of small join sides.
"""

from __future__ import annotations

from gents_spark.driver_queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filters_push_into_scan(spark):
    p = _plan(spark, "filter_include_exclude")
    assert "PushedFilters" in p
    # the time-range predicate must reach the parquet reader
    assert "GreaterThanOrEqual(ts" in p and "LessThan(ts" in p


def test_rollup_scan_prunes_columns(spark):
    p = _plan(spark, "rollup_1m")
    # events has 6 columns; the rollup needs only ts, event_type, value
    assert "ReadSchema" in p
    sched = p[p.index("ReadSchema"):].splitlines()[0]
    assert "ts" in sched and "event_type" in sched and "value" in sched
    assert "props" not in sched and "user_id" not in sched


def test_rollup_has_partial_aggregation(spark):
    """Map-side combine before the exchange — the property that keeps the
    (source,bucket) shuffle proportional to bucket count, not row count."""
    p = _plan(spark, "rollup_1h")
    lower = p.lower()
    assert lower.count("hashaggregate") >= 2  # partial + final
    assert "exchange" in lower


def test_small_dim_join_broadcasts(spark):
    p = _plan(spark, "revenue_by_segment")
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_anti_join_stays_a_join(spark):
    p = _plan(spark, "customers_no_orders")
    assert "LeftAnti" in p or "left_anti" in p.lower()
