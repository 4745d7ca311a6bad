"""Tier-point exactness vs the pandas oracle (M1).

Mirrors the reference's golden properties
(``gents/tests/test_workflow.py``): output count == groups × windows,
time monotonic per group, values exactly equal to an independent
recomputation, order independence.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from gents_spark.operators.rollup import TIER_ORDER, cascade, rollup, rollup_from_finer
from gents_spark.synth import synth_sequences
from gents_spark.timeparse import with_event_time
from tests.oracle import oracle_rollup

STEP_S = 10  # 6 rows / minute / source (FIXTURES.md `simple`)


@pytest.fixture(scope="module")
def raw(spark):
    df = synth_sequences(spark, n_sources=3, seqs_per_source=400, seed=42)
    return with_event_time(df, step_s=STEP_S).persist()


@pytest.fixture(scope="module")
def raw_pdf(raw):
    return raw.select("source", "event_time", "n_tok").toPandas()


def _spark_tier_pdf(df):
    return (
        df.orderBy("source", "bucket_start")
        .toPandas()
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("tier", TIER_ORDER)
def test_tier_points_match_oracle_exactly(raw, raw_pdf, tier):
    got = _spark_tier_pdf(rollup(raw, tier))
    exp = oracle_rollup(raw_pdf, tier)
    assert len(got) == len(exp)
    # integers exact
    for c in ["cnt", "sum_tok", "min_tok", "max_tok"]:
        assert (got[c].astype("int64") == exp[c].astype("int64")).all(), c
    # percentiles bitwise-equal (same linear-interpolation definition)
    for c in ["p50_tok", "p95_tok", "p99_tok"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert (got["source"] == exp["source"]).all()
    assert (
        pd.to_datetime(got["bucket_start"]).to_numpy()
        == pd.to_datetime(exp["bucket_start"]).to_numpy()
    ).all()


def test_bucket_monotonic_and_bounds(raw):
    """Analog of test_workflow.py:14-16 (monotonic time) + bounds bracket."""
    t = rollup(raw, "1m")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("bucket_start")
    viol = (
        t.withColumn("prev", F.lag("bucket_start").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("bucket_start") <= F.col("prev")))
        .count()
    )
    assert viol == 0
    assert t.filter(F.col("bucket_end") <= F.col("bucket_start")).count() == 0


def test_output_count_is_groups_times_windows(raw):
    """Analog of test_workflow.py:37,70: one output row per (group, window)."""
    t = rollup(raw, "1m")
    expected = (
        raw.select("source", F.date_trunc("minute", "event_time").alias("b"))
        .distinct()
        .count()
    )
    assert t.count() == expected


def test_additive_composition_matches_direct(raw):
    """1m --compose--> 1h additive stats == direct raw->1h rollup."""
    t1m = rollup(raw, "1m")
    composed = _spark_tier_pdf(rollup_from_finer(t1m, "1h"))
    direct = _spark_tier_pdf(
        rollup(raw, "1h").select(
            "source", "tier", "bucket_start", "bucket_end",
            "cnt", "sum_tok", "min_tok", "max_tok",
        )
    )
    pd.testing.assert_frame_equal(composed, direct)


def test_order_independence(spark, raw):
    """Analog of scrambled_case (test_cases.py:158-171): shuffled input
    partitioning yields identical tier points."""
    scrambled = raw.repartition(13, "n_tok")  # arbitrary reshuffle
    a = _spark_tier_pdf(rollup(raw, "1m"))
    b = _spark_tier_pdf(rollup(scrambled, "1m"))
    pd.testing.assert_frame_equal(a, b)


def test_cascade_returns_all_tiers(raw):
    tiers = cascade(raw)
    assert set(tiers) == set(TIER_ORDER)
    counts = {t: df.count() for t, df in tiers.items()}
    assert counts["1m"] >= counts["1h"] >= counts["1d"] > 0
