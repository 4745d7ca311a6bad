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


def test_sketch_percentiles_within_rank_error(spark):
    """percentile_mode='sketch' (approx_percentile GK sketch): every
    reported percentile must sit within the documented rank-error bound
    of the exact rank interval, and additive stats must be identical to
    the exact path.  Hot-bucket fixture: one bucket with 60k values —
    the regime where collect_list memory is the scale risk."""
    import pyspark.sql.functions as F

    from gents_spark.operators.rollup import (
        PCTS,
        _PCT_NAMES,
        max_bucket_count,
        rollup,
    )

    n = 60_000
    df = spark.range(n).select(
        F.lit("hot").alias("source"),
        F.lit("2026-01-01 00:00:30").cast("timestamp").alias("event_time"),
        (F.col("id") % 977).cast("int").alias("n_tok"),  # skewed-ish values
    )
    assert max_bucket_count(df, "1m") == n

    exact = rollup(df, "1m").collect()[0]
    sk = rollup(df, "1m", percentile_mode="sketch",
                sketch_accuracy=10_000).collect()[0]
    for c in ("cnt", "sum_tok", "min_tok", "max_tok"):
        assert sk[c] == exact[c]

    vals = sorted(((i % 977) for i in range(n)))
    eps = 1.0 / 10_000
    for p, name in zip(PCTS, _PCT_NAMES):
        lo = vals[max(0, int((p - eps) * (n - 1)) - 1)]
        hi = vals[min(n - 1, int((p + eps) * (n - 1)) + 1)]
        assert lo <= sk[name] <= hi, (name, sk[name], lo, hi)


def test_percentile_auto_mode_picks_by_bucket_size(spark):
    """'auto' uses exact under the limit (bit-identical to exact mode)
    and the sketch above it (schema unchanged either way)."""
    import pyspark.sql.functions as F

    from gents_spark.operators.rollup import rollup
    from gents_spark.synth import synth_sequences
    from gents_spark.timeparse import with_event_time

    raw = with_event_time(synth_sequences(spark, 2, 400), step_s=10)
    small_auto = rollup(raw, "1m", percentile_mode="auto",
                        hot_bucket_limit=1000)
    small_exact = rollup(raw, "1m")
    assert sorted(map(tuple, small_auto.collect())) == sorted(
        map(tuple, small_exact.collect())
    )
    hot_auto = rollup(raw, "1m", percentile_mode="auto", hot_bucket_limit=1)
    assert hot_auto.columns == small_exact.columns
    assert hot_auto.count() == small_exact.count()


def test_stored_sketches_survive_raw_expiry(spark, raw, tmp_path):
    """Round-2 VERDICT #3 (persisted mergeable sketches): build the 1m
    tier WITH the stored histogram-sketch column, then derive 1h
    percentiles from the STORED sketches alone (raw never touched — the
    post-retention-expiry scenario).  Integer measures keep the sketch
    exact, so the merged percentiles must equal the exact-from-raw path
    identically, and the additive cnt must round-trip too."""
    from gents_spark.operators.sketches import (
        histogram_percentiles,
        merge_histograms,
    )
    from gents_spark.pipeline import TierPipeline
    from gents_spark.plans.manifest import read_tier

    out = str(tmp_path / "sk")
    seqs = synth_sequences(spark, n_sources=3, seqs_per_source=400, seed=42)
    TierPipeline(
        spark, step_s=STEP_S, tiers=["1m"], gapfill_mode=None,
        store_sketches=True,
    ).run(seqs, out, run_id="sk")

    # exact 1h truth computed from raw, BEFORE "expiry"
    exp = {
        (r["source"], r["bucket_start"]): r
        for r in rollup(raw, "1h").collect()
    }

    # after expiry: only the written 1m tier exists
    t1m = read_tier(spark, out + "/tiers", "1m")
    assert "vh" in t1m.columns
    h1h = merge_histograms(
        t1m.filter(~F.col("filled")).select("source", "bucket_start", "vh"),
        "1h",
    )
    got = histogram_percentiles(h1h).collect()
    assert len(got) == len(exp)
    for r in got:
        e = exp[(r["source"], r["bucket_start"])]
        assert r["cnt"] == e["cnt"]
        assert (r["p50_tok"], r["p95_tok"], r["p99_tok"]) == (
            e["p50_tok"], e["p95_tok"], e["p99_tok"],
        )


def test_distinct_sketch_merges_losslessly(spark):
    """HLL distinct-doc sketches: (1) estimates track exact counts
    within the lgk=12 error bound; (2) 1m sketches unioned up to 1h
    give the IDENTICAL estimate as sketching the raw at 1h directly
    (register-wise max), so distinct counts survive raw expiry."""
    import pyspark.sql.functions as F

    from gents_spark.operators.sketches import (
        distinct_sketch,
        merge_distinct_sketches,
    )
    from gents_spark.synth import synth_sequences
    from gents_spark.timeparse import with_event_time

    raw = with_event_time(
        synth_sequences(spark, 2, 1500, n_tok_lo=8, n_tok_hi=64), step_s=10
    )
    m1 = distinct_sketch(raw, "1m")
    direct_1h = {
        (r.source, r.bucket_start): r.dv_est
        for r in distinct_sketch(raw, "1h").collect()
    }
    merged_1h = {
        (r.source, r.bucket_start): r.dv_est
        for r in merge_distinct_sketches(m1, "1h").collect()
    }
    assert merged_1h == direct_1h  # union == rebuild, exactly
    exact_1h = {
        (r.source, r.bucket_start): r.n
        for r in raw.groupBy(
            "source", F.date_trunc("hour", "event_time").alias("bucket_start")
        ).agg(F.countDistinct("doc_id").alias("n")).collect()
    }
    assert set(exact_1h) == set(direct_1h)
    for k, exact in exact_1h.items():
        assert abs(direct_1h[k] - exact) <= max(2, 0.05 * exact), (
            k, direct_1h[k], exact,
        )


def test_pipeline_stored_distinct_sketch_survives_expiry(spark, raw, tmp_path):
    """store_distinct=True: the written 1m tier carries the HLL
    dv_sketch column; after raw 'expiry' the 1h distinct-doc counts
    recompose from the stored sketches alone and equal a direct
    count-distinct over raw (sparse-exact at this cardinality)."""
    from gents_spark.operators.sketches import merge_distinct_sketches
    from gents_spark.pipeline import TierPipeline
    from gents_spark.plans.manifest import read_tier

    out = str(tmp_path / "dv")
    seqs = synth_sequences(spark, n_sources=3, seqs_per_source=400, seed=42)
    TierPipeline(
        spark, step_s=STEP_S, tiers=["1m"], gapfill_mode=None,
        store_distinct=True,
    ).run(seqs, out, run_id="dv")

    t1m = read_tier(spark, out + "/tiers", "1m")
    assert "dv_sketch" in t1m.columns
    got = {
        (r.source, r.bucket_start): r.dv_est
        for r in merge_distinct_sketches(
            t1m.filter(~F.col("filled")).select(
                "source", "bucket_start", "dv_sketch"
            ),
            "1h",
        ).collect()
    }
    exact = {
        (r.source, r.bucket_start): r.n
        for r in raw.groupBy(
            "source", F.date_trunc("hour", "event_time").alias("bucket_start")
        ).agg(F.countDistinct("doc_id").alias("n")).collect()
    }
    assert got == exact


def test_w2_alignment_methods(spark, raw):
    """W2: the four window-assignment alignments
    (gents/hfcollection.py:966-978).  Intervals are [ts, ts+90s), so on
    a 1m tier start/midpoint/end can land in three DIFFERENT buckets;
    direct == start_bound; every alignment keeps global cnt; and the
    aligned bucket of each interval equals the trunc of its chosen
    representative computed independently."""
    import pytest as _pytest

    from gents_spark.operators.rollup import aligned_ts

    iv = raw.withColumn(
        "t_end", F.timestamp_add("SECOND", F.lit(90), F.col("event_time"))
    )
    outs = {
        a: rollup(
            iv, "1m", with_percentiles=False, ts_end_col="t_end", alignment=a
        )
        for a in ("direct", "start_bound", "end_bound", "midpoint")
    }
    total = raw.count()
    pdfs = {a: o.toPandas() for a, o in outs.items()}
    for a, pdf in pdfs.items():
        assert pdf["cnt"].sum() == total, a
    # direct and start_bound identical
    key = ["source", "bucket_start"]
    d = pdfs["direct"].sort_values(key).reset_index(drop=True)
    s = pdfs["start_bound"].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(d, s)
    # representative-timestamp truncation, cross-checked per row
    rep = iv.select(
        "source",
        F.date_trunc("minute", aligned_ts("event_time", "t_end", "midpoint"))
        .alias("b_mid"),
        F.date_trunc("minute", aligned_ts("event_time", "t_end", "end_bound"))
        .alias("b_end"),
    )
    mid_expect = {
        (r.source, r.b_mid): r.n
        for r in rep.groupBy("source", "b_mid").agg(F.count("*").alias("n")).collect()
    }
    mid_got = {
        (r.source, r.bucket_start): r.cnt for r in outs["midpoint"].collect()
    }
    assert mid_got == mid_expect
    end_expect = {
        (r.source, r.b_end): r.n
        for r in rep.groupBy("source", "b_end").agg(F.count("*").alias("n")).collect()
    }
    end_got = {
        (r.source, r.bucket_start): r.cnt for r in outs["end_bound"].collect()
    }
    assert end_got == end_expect
    # a 90s interval guarantees the alignments actually disagree somewhere
    assert mid_got != {
        (r.source, r.bucket_start): r.cnt for r in outs["direct"].collect()
    }
    # error paths
    with _pytest.raises(ValueError):
        aligned_ts("event_time", None, "midpoint")
    with _pytest.raises(ValueError):
        aligned_ts("event_time", "t_end", "bogus")


def test_time_bucket_matches_python_floor(spark):
    """time_bucket(width, origin) vs pure-Python floor arithmetic over
    random widths/origins, including timestamps BEFORE the origin
    (pmod, not truncating mod) and sub-second timestamps (integer-us,
    never unix-second truncation)."""
    import random
    from datetime import datetime, timedelta

    from gents_spark.operators.rollup import time_bucket

    rng = random.Random(50)
    t0 = datetime(2026, 1, 1)
    rows = [
        (i, t0 + timedelta(seconds=rng.randint(-400_000, 400_000),
                           microseconds=rng.randint(0, 999_999)))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "i long, ts timestamp")
    for width_s, origin in [
        (900, "2026-01-01 00:07:30"),
        (90, "2026-01-01 00:00:00"),
        (86_400, "2025-12-31 12:00:00"),
    ]:
        got = {
            r["i"]: r["b"]
            for r in df.select(
                "i", time_bucket("ts", width_s, origin).alias("b")
            ).collect()
        }
        o_us = int((datetime.fromisoformat(origin)
                    - datetime(1970, 1, 1)).total_seconds()) * 1_000_000
        w_us = width_s * 1_000_000
        for i, ts in rows:
            us = (ts - datetime(1970, 1, 1)) // timedelta(microseconds=1)
            exp_us = us - ((us - o_us) % w_us)  # python % is pmod
            exp = datetime(1970, 1, 1) + timedelta(microseconds=exp_us)
            assert got[i] == exp, (width_s, origin, i)
            assert exp <= ts < exp + timedelta(seconds=width_s)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        time_bucket("ts", 0)


def test_sliding_rollup_overlap_and_tumbling_degenerate(spark):
    """Hopping windows: with slide == width the result equals the
    tumbling date_trunc rollup; with slide == width/2 every event lands
    in exactly 2 windows (total cnt doubles) and each window's stats
    equal a brute-force recompute."""
    import random
    from datetime import datetime, timedelta

    from gents_spark.operators.rollup import sliding_rollup

    rng = random.Random(51)
    t0 = datetime(2026, 1, 1)
    rows = [
        (f"s{i % 3}",
         t0 + timedelta(seconds=rng.randint(0, 6 * 3600 - 1)),
         rng.randint(-500, 500))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "source string, ts timestamp, v long")

    tumb = {
        (r["source"], r["bucket_start"]): (r["cnt"], r["sum_v"])
        for r in sliding_rollup(
            df, 3600, 3600, "source", "ts", "v"
        ).collect()
    }
    exp_tumb = {}
    for s, ts, v in rows:
        b = ts.replace(minute=0, second=0)
        c, sv = exp_tumb.get((s, b), (0, 0))
        exp_tumb[(s, b)] = (c + 1, sv + v)
    assert tumb == exp_tumb

    hop = sliding_rollup(df, 3600, 1800, "source", "ts", "v").collect()
    assert sum(r["cnt"] for r in hop) == 2 * len(rows)
    exp_hop = {}
    for s, ts, v in rows:
        us = int((ts - datetime(1970, 1, 1)).total_seconds())
        for k in (0, 1):
            b = datetime(1970, 1, 1) + timedelta(
                seconds=(us // 1800 - k) * 1800
            )
            c, sv, mn, mx = exp_hop.get((s, b), (0, 0, None, None))
            exp_hop[(s, b)] = (
                c + 1, sv + v,
                v if mn is None else min(mn, v),
                v if mx is None else max(mx, v),
            )
    got_hop = {
        (r["source"], r["bucket_start"]): (
            r["cnt"], r["sum_v"], r["min_v"], r["max_v"]
        )
        for r in hop
    }
    assert got_hop == exp_hop

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sliding_rollup(df, 3600, 2400, "source", "ts", "v")


def test_time_bucket_sliding_rollup_cross_consistency(spark):
    """Cross-operator invariant: sliding_rollup(w, w) buckets equal a
    plain time_bucket(w) groupBy — two independent bucket
    implementations (F.window vs integer-us pmod) must agree on every
    epoch-aligned boundary, including sub-second timestamps."""
    import random
    from datetime import datetime, timedelta

    import pyspark.sql.functions as F

    from gents_spark.operators.rollup import sliding_rollup, time_bucket

    rng = random.Random(54)
    t0 = datetime(2026, 1, 1)
    rows = [
        (f"s{i % 3}",
         t0 + timedelta(seconds=rng.randint(0, 7200),
                        microseconds=rng.randint(0, 999_999)),
         rng.randint(-100, 100))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "source string, ts timestamp, v long")
    for w in (90, 900):
        a = {
            (r["source"], r["bucket_start"]): (r["cnt"], r["sum_v"])
            for r in sliding_rollup(df, w, w, "source", "ts", "v").collect()
        }
        b = {
            (r["source"], r["b"]): (r["cnt"], r["sum_v"])
            for r in df.groupBy(
                "source", time_bucket("ts", w).alias("b")
            ).agg(
                F.count("*").alias("cnt"), F.sum("v").alias("sum_v")
            ).collect()
        }
        assert a == b, w
