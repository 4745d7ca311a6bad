"""As-of join + time-weighted average + counter aggregation semantics.

(Engine-vs-DuckDB value equivalence is covered by the driver gate /
tools/check_oracles.py; these pin hand-computed semantics.)
"""

from __future__ import annotations

import pyspark.sql.functions as F

from gents_spark.operators.asof import asof_join
from gents_spark.operators.counters import counter_agg, time_weighted_avg


def _ts(s):
    return F.lit(s).cast("timestamp")


def test_asof_join_carries_across_days(spark):
    """Each left row takes the LATEST right row at-or-before it, including
    ties (same ts) and matches carried across day-chunk boundaries; rows
    before any right row stay null."""
    left = spark.createDataFrame(
        [
            (1, "a", "2026-01-01 00:30:00"),
            (2, "a", "2026-01-02 05:00:00"),  # right side silent on day 2
            (3, "a", "2026-01-03 10:00:00"),  # after day-3 right row
            (4, "a", "2026-01-01 00:00:00"),  # tie with right ts -> match
            (5, "b", "2026-01-01 09:00:00"),  # b has no right rows -> null
        ],
        "event_id long, source string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("a", "2026-01-01 00:00:00", 10),
            ("a", "2026-01-03 09:00:00", 30),
        ],
        "source string, bucket_start string, v int",
    ).withColumn("bucket_start", F.col("bucket_start").cast("timestamp"))

    out = {
        r["event_id"]: r["v"]
        for r in asof_join(
            left, right, key="source", left_ts="ts",
            right_ts="bucket_start", right_cols=["v"],
        ).collect()
    }
    assert out == {1: 10, 2: 10, 3: 30, 4: 10, 5: None}


def test_asof_join_attaches_right_rows_atomically(spark):
    """A right row whose column is NULL must be carried AS A ROW: the
    newer row's null wins over an older row's value (per-column carries
    would stitch fields from different rows — round-2 ADVICE #2)."""
    import pytest

    left = spark.createDataFrame(
        [(1, "a", "2026-01-01 10:00:00")],
        "event_id long, source string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("a", "2026-01-01 00:00:00", 10, "x"),
            ("a", "2026-01-01 05:00:00", None, "y"),  # newer row, null v
        ],
        "source string, bucket_start string, v int, tag string",
    ).withColumn("bucket_start", F.col("bucket_start").cast("timestamp"))
    r = asof_join(
        left, right, key="source", left_ts="ts",
        right_ts="bucket_start", right_cols=["v", "tag"],
    ).collect()[0]
    assert (r["v"], r["tag"]) == (None, "y")  # the 05:00 ROW, atomically

    # name collision between left and carried right columns must raise
    with pytest.raises(ValueError, match="already exist on the left"):
        asof_join(
            left.withColumn("v", F.lit(0)), right,
            key="source", left_ts="ts", right_ts="bucket_start",
            right_cols=["v", "tag"],
        )


def test_twa_hand_computed(spark):
    """Bucket with points (t=0s,v=10), (t=10s,v=20), (t=30s,v=0):
    weights 10s and 20s -> twa = (10*10 + 20*20)/30 = 16.666667; the
    last point carries no weight.  Single-point buckets yield NULL."""
    ev = spark.createDataFrame(
        [
            (1, "a", "2026-01-01 00:00:00", 10.0),
            (2, "a", "2026-01-01 00:00:10", 20.0),
            (3, "a", "2026-01-01 00:00:30", 0.0),
            (4, "b", "2026-01-01 00:00:05", 99.0),  # lone point
        ],
        "event_id long, source string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {
        r["source"]: r
        for r in time_weighted_avg(ev, "1h", key="source").collect()
    }
    assert rows["a"]["twa"] == 16.666667
    assert rows["a"]["covered_s"] == 30.0
    assert rows["a"]["n_points"] == 3
    assert rows["b"]["twa"] is None
    assert rows["b"]["covered_s"] == 0.0


def test_counter_agg_resets(spark):
    """Counter 5 -> 8 -> 2 -> 6 in one bucket: increases 3 and 4, one
    reset contributing the restarted value 2 -> increase = 9."""
    ev = spark.createDataFrame(
        [
            (1, "a", "2026-01-01 00:00:00", 5.0),
            (2, "a", "2026-01-01 00:10:00", 8.0),
            (3, "a", "2026-01-01 00:20:00", 2.0),
            (4, "a", "2026-01-01 00:30:00", 6.0),
        ],
        "event_id long, source string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = counter_agg(ev, "1h", key="source").collect()[0]
    assert r["increase"] == 3.0 + 2.0 + 4.0
    assert r["n_resets"] == 1
    assert r["first_v"] == 5.0 and r["last_v"] == 6.0


def test_asof_plan_no_range_explosion(spark):
    """The as-of join must be the union-and-carry shape: no
    CartesianProduct / BroadcastNestedLoopJoin (a naive l.ts >= r.ts
    range join explodes O(|L| x |R|) per key)."""
    left = spark.createDataFrame(
        [(1, "a", "2026-01-01 00:00:00")],
        "event_id long, source string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("a", "2026-01-01 00:00:00", 1)],
        "source string, bucket_start string, v int",
    ).withColumn("bucket_start", F.col("bucket_start").cast("timestamp"))
    plan = (
        asof_join(left, right, right_cols=["v"], left_ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_tolerance_bounds_staleness(spark):
    """merge_asof-tolerance analog: the same fixture as the carry test,
    but matches staler than the bound are dropped (keeping NULLs) — the
    cross-day carried match (29h stale) dies under a 2h bound while
    fresh matches survive, including the boundary-exact one."""
    left = spark.createDataFrame(
        [
            (1, "a", "2026-01-01 00:30:00"),  # 0.5h stale -> keep
            (2, "a", "2026-01-02 05:00:00"),  # 29h stale  -> drop
            (3, "a", "2026-01-03 11:00:00"),  # exactly 2h -> keep (<=)
            (4, "a", "2026-01-03 11:00:01"),  # 2h + 1s    -> drop
        ],
        "event_id long, source string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("a", "2026-01-01 00:00:00", 10),
            ("a", "2026-01-03 09:00:00", 30),
        ],
        "source string, bucket_start string, v int",
    ).withColumn("bucket_start", F.col("bucket_start").cast("timestamp"))

    out = {
        r["event_id"]: r["v"]
        for r in asof_join(
            left, right, key="source", left_ts="ts",
            right_ts="bucket_start", right_cols=["v"], tolerance_s=7200,
        ).collect()
    }
    assert out == {1: 10, 2: None, 3: 30, 4: None}


def test_pack_tokens_concat_and_chop(spark):
    """Packing semantics on a hand-computable stream: budget 10, weights
    4/4/4/3 -> cum_before 0,4,8,12; packs 0,0,0,1; the straddling third
    doc belongs to the window of its FIRST token (offset 8); per-key
    independence; budget validation."""
    import pytest as _pytest

    from gents_spark.operators.packing import pack_stats, pack_tokens

    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 4), ("a", 3, 4), ("a", 4, 3),
         ("b", 1, 9), ("b", 2, 2)],
        "source string, doc_id long, n_tok long",
    )
    rows = {
        (r.source, r.doc_id): r
        for r in pack_tokens(df, budget=10).collect()
    }
    assert [(rows[("a", i)].pack_id, rows[("a", i)].offset_in_pack)
            for i in (1, 2, 3, 4)] == [(0, 0), (0, 4), (0, 8), (1, 2)]
    assert [(rows[("b", i)].pack_id, rows[("b", i)].offset_in_pack)
            for i in (1, 2)] == [(0, 0), (0, 9)]
    st = {
        (r.source, r.pack_id): (r.n_seqs, r.sum_tok)
        for r in pack_stats(pack_tokens(df, budget=10)).collect()
    }
    assert st[("a", 0)] == (3, 12) and st[("a", 1)] == (1, 3)
    # budget-aware census: a.doc3 (offset 8, len 4) straddles into pack
    # 1 with overhang 2; b.doc2 (offset 9, len 2) overhangs 1
    bst = {
        (r.source, r.pack_id): (r.n_straddle, r.max_overhang)
        for r in pack_stats(
            pack_tokens(df, budget=10), budget=10
        ).collect()
    }
    assert bst[("a", 0)] == (1, 2)
    assert bst[("a", 1)] == (0, 0)
    assert bst[("b", 0)] == (1, 1)
    with _pytest.raises(ValueError):
        pack_tokens(df, budget=0)


def test_pack_tokens_chunked_equals_plain(spark):
    """The giant-single-key escape hatch is EXACTLY the plain operator:
    chunked parallel-prefix packing (per-(key, chunk) local prefix +
    summary-offset carry) reproduces cum_before/pack_id/offset_in_pack
    bit-for-bit on multi-chunk data, including one dominant source
    (the skew case the chunking exists for) and chunk-straddling packs."""
    import pyspark.sql.functions as F

    from gents_spark.operators.packing import pack_tokens, pack_tokens_chunked

    # 'big' = 200 docs across 10 chunks (doc_id prefix), 'small' = 7;
    # weights vary so pack boundaries straddle chunk boundaries
    rows = [("big", f"{i//20:02d}-{i:04d}", 3 + i % 7) for i in range(200)]
    rows += [("small", f"{i:02d}-x", 5) for i in range(7)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, n_tok long"
    ).repartition(8)
    plain = {
        (r.source, r.doc_id): (r.cum_before, r.pack_id, r.offset_in_pack)
        for r in pack_tokens(df, budget=16).collect()
    }
    chunked = {
        (r.source, r.doc_id): (r.cum_before, r.pack_id, r.offset_in_pack)
        for r in pack_tokens_chunked(
            df, budget=16, chunk=F.substring("doc_id", 1, 2)
        ).collect()
    }
    assert chunked == plain and len(plain) == 207
    # default chunk expression (2-char order prefix) also matches
    chunked_dflt = {
        (r.source, r.doc_id): (r.cum_before, r.pack_id, r.offset_in_pack)
        for r in pack_tokens_chunked(df, budget=16).collect()
    }
    assert chunked_dflt == plain


def test_pack_tokens_chunked_rejects_numeric_default_chunk(spark):
    """r05 review: the default 2-char-prefix chunk is only monotone for
    string ids ('9' > '10' stringified) — numeric order columns must
    raise instead of silently packing in the wrong order."""
    import pytest

    from gents_spark.operators.packing import pack_tokens_chunked

    df = spark.createDataFrame(
        [(1, "s", 5)], "doc_id long, source string, n_tok long"
    )
    with pytest.raises(ValueError, match="monotone"):
        pack_tokens_chunked(df, budget=10)


def test_asof_directions_match_pandas_merge_asof(spark):
    """asof_join backward/forward/nearest (with and without tolerance)
    vs pandas.merge_asof on random multi-key streams — pandas is the
    independent reference implementation of the direction semantics,
    including at-or-equal ties and the nearest tie -> backward rule."""
    import random
    from datetime import datetime, timedelta

    import pandas as pd

    from gents_spark.operators.asof import asof_join

    rng = random.Random(97)
    t0 = datetime(2024, 1, 1)
    right_rows, left_rows = [], []
    for k in ("a", "b", "c"):
        # unique right timestamps per key (asof contract), ~3 days span
        rts = sorted(rng.sample(range(0, 260_000, 20), 60))
        for i, s in enumerate(rts):
            right_rows.append((k, t0 + timedelta(seconds=s), i * 10))
        for _ in range(120):
            s = rng.randrange(-5_000, 265_000)
            left_rows.append((k, t0 + timedelta(seconds=s)))
    right = spark.createDataFrame(
        right_rows, "source string, bucket_start timestamp, rv long"
    )
    left = spark.createDataFrame(left_rows, "source string, ts timestamp")
    rpd = pd.DataFrame(right_rows, columns=["source", "bucket_start", "rv"])
    lpd = (
        pd.DataFrame(left_rows, columns=["source", "ts"])
        .sort_values("ts")
        .reset_index(drop=True)
    )
    rpd = rpd.sort_values("bucket_start").reset_index(drop=True)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 50.0):
            got = {
                (r["source"], r["ts"]): r["rv"]
                for r in asof_join(
                    left, right, key="source", left_ts="ts",
                    right_ts="bucket_start", right_cols=["rv"],
                    tolerance_s=tol, direction=direction,
                ).collect()
            }
            exp_df = pd.merge_asof(
                lpd, rpd, left_on="ts", right_on="bucket_start",
                by="source", direction=direction,
                tolerance=(
                    pd.Timedelta(seconds=tol) if tol is not None else None
                ),
            )
            for _, row in exp_df.iterrows():
                e = None if pd.isna(row["rv"]) else int(row["rv"])
                assert got[(row["source"], row["ts"].to_pydatetime())] == e, (
                    direction, tol, row["source"], row["ts"]
                )

    import pytest as _pt

    with _pt.raises(ValueError):
        asof_join(left, right, right_cols=["rv"], direction="sideways")
