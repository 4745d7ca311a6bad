"""applyInPandasWithState: state survives across micro-batches + restart."""

from __future__ import annotations

import pyspark.sql.functions as F

from gents_spark.streaming.stateful import running_source_totals
from gents_spark.synth import synth_sequences
from gents_spark.timeparse import parse_seq


def _write_batch(spark, path, n_sources, per_source, offset):
    df = parse_seq(synth_sequences(spark, n_sources, per_source)).select(
        "source", (F.col("seq") + offset).alias("seq"), "n_tok"
    )
    df.write.mode("append").parquet(path)
    return df


def _run_stream(spark, in_path, out_path, ckpt):
    stream = (
        spark.readStream.schema("source string, seq long, n_tok int")
        .parquet(in_path)
    )
    q = (
        running_source_totals(stream)
        .writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(out_path)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


def test_state_accumulates_across_restarts(spark, tmp_path):
    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, in_path, 2, 100, offset=0)
    _run_stream(spark, in_path, out_path, ckpt)

    _write_batch(spark, in_path, 2, 50, offset=1000)
    _run_stream(spark, in_path, out_path, ckpt)  # restart from checkpoint

    out = spark.read.parquet(out_path)
    # latest totals per source must reflect BOTH batches (state carried)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("cnt"))
    latest = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert len(latest) == 2
    for r in latest:
        assert r["cnt"] == 150          # 100 + 50
        assert r["max_seq"] == 1049     # offset 1000 + 49
        assert r["sum_tok"] > 0


def test_streaming_ewma_matches_batch_bit_equal(spark, tmp_path):
    """streaming_ewma across a restart == the unbounded-frame batch
    fold (ewma_smooth with window >= series length), bit-equal doubles:
    both run x*0.25 + acc*0.75 left-to-right from the same seed."""
    from pyspark.sql import Window

    from gents_spark.operators.anomaly import ewma_smooth
    from gents_spark.streaming.stateful import streaming_ewma

    in_path = str(tmp_path / "ein")
    out_path = str(tmp_path / "eout")
    ckpt = str(tmp_path / "eckpt")

    def batch(offset, per_source):
        df = parse_seq(synth_sequences(spark, 2, per_source)).select(
            "source",
            (F.col("seq") + offset).alias("seq"),
            (F.col("n_tok").cast("double") / 7.0).alias("v"),
        )
        df.write.mode("append").parquet(in_path)

    def run():
        stream = (
            spark.readStream.schema("source string, seq long, v double")
            .parquet(in_path)
        )
        q = (
            streaming_ewma(stream, alpha=0.25)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_path)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    batch(0, 150)
    run()
    batch(1000, 75)
    run()  # restart: state must seed from the checkpoint, not re-fold

    out = spark.read.parquet(out_path)
    w = Window.partitionBy("source").orderBy(F.desc("n"))
    got = {
        r["source"]: (r["n"], r["ewma"])
        for r in out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }

    ref = ewma_smooth(
        spark.read.parquet(in_path),
        key="source", order="seq", value="v", alpha=0.25, window=10**6,
    )
    want = {
        r["source"]: (r["n_in_window"], r["ewma"])
        for r in ref.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("seq"))
            )
        ).filter(F.col("rn") == 1).collect()
    }
    assert got == want  # exact, including the doubles


def test_streaming_gap_detect_stale_and_recovery(spark, tmp_path):
    """Liveness semantics across two availableNow runs + a checkpoint
    restart: B stops feeding -> ONE 'stale' alarm once the watermark
    passes last_seen + liveness (and only one, no re-alarm); A resumes
    after a 3h silence -> a 'recovered' row with the exact closed gap,
    measured to the FIRST resumed event."""
    from datetime import datetime, timedelta

    from gents_spark.streaming.stateful import streaming_gap_detect

    t0 = datetime(2024, 1, 1)
    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "source string, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(in_path)

    def run():
        stream = (
            spark.readStream.schema("source string, ts timestamp")
            .parquet(in_path)
        )
        q = (
            streaming_gap_detect(
                stream, liveness_s=7200, watermark="30 minutes"
            )
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_path)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    # run 1: A beats hourly to t0+5h, B stops at t0+2h
    write(
        [("a", t0 + timedelta(hours=h)) for h in range(6)]
        + [("b", t0 + timedelta(hours=h)) for h in range(3)]
    )
    run()
    # watermark after the data batch = 5h - 30m = 4.5h; B's deadline
    # (2h + 2h) is behind it -> the no-data batch fires B's timeout
    out1 = {
        (r["source"], r["status"]): r
        for r in spark.read.parquet(out_path).collect()
    }
    b_stale = out1[("b", "stale")]
    assert b_stale["gap_s"] == 9000  # 4.5h watermark - 2h last_seen
    assert b_stale["n_events"] == 3
    assert ("a", "stale") not in out1  # A's deadline (7h) not reached

    # run 2 (restart from checkpoint): A resumes at 8h after a 3h hole
    write([("a", t0 + timedelta(hours=h)) for h in (8, 9, 10)])
    run()
    rows2 = spark.read.parquet(out_path).collect()
    rec = [r for r in rows2 if r["status"] == "recovered"]
    assert len(rec) == 1 and rec[0]["source"] == "a"
    assert rec[0]["gap_s"] == 10800  # 8h - 5h, to the FIRST resumed beat
    # B must NOT alarm again while still silent (no re-arm after stale)
    assert sum(
        1 for r in rows2 if r["source"] == "b" and r["status"] == "stale"
    ) == 1
    # live rows carry running totals through the restart
    a_live = max(
        (r for r in rows2 if r["source"] == "a" and r["status"] == "live"),
        key=lambda r: r["n_events"],
    )
    assert a_live["n_events"] == 9


def test_streaming_heavy_hitters_bounds_across_restart(spark, tmp_path):
    """Misra-Gries invariants after two micro-batch runs through one
    checkpoint (state carried across a restart): every phi-heavy term
    is present, every estimate is an undercount within max_err, and the
    summary never exceeds k counters."""
    import random
    from collections import Counter

    from gents_spark.streaming.stateful import streaming_heavy_hitters

    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    K = 8

    rng = random.Random(49)
    truth: dict[str, Counter] = {"s0": Counter(), "s1": Counter()}

    def make_batch(offset):
        rows = []
        for s in ("s0", "s1"):
            for i in range(3):  # heavy terms: ~100 each per batch
                heavy = f"h{i}"
                for _ in range(100 - 10 * i):
                    rows.append((s, heavy))
            for j in range(200):  # long singleton tail
                rows.append((s, f"t{offset + j}"))
        for s, t in rows:
            truth[s][t] += 1
        rng.shuffle(rows)
        return spark.createDataFrame(rows, "source string, term string")

    def run_once():
        stream = (
            spark.readStream.schema("source string, term string")
            .parquet(in_path)
        )
        q = (
            streaming_heavy_hitters(stream, k=K)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_path)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    make_batch(0).write.mode("append").parquet(in_path)
    run_once()
    make_batch(1000).write.mode("append").parquet(in_path)
    run_once()  # restart from checkpoint

    out = spark.read.parquet(out_path)
    latest = {
        r["source"]: r["mx"]
        for r in out.groupBy("source").agg(
            F.max("n_seen").alias("mx")
        ).collect()
    }
    rows = [
        r for r in out.collect() if r["n_seen"] == latest[r["source"]]
    ]
    per: dict[str, dict] = {}
    for r in rows:
        per.setdefault(r["source"], {})[r["term"]] = (
            r["est"], r["max_err"], r["n_seen"]
        )
    for s in ("s0", "s1"):
        n_true = sum(truth[s].values())
        summary = per[s]
        assert len(summary) <= K
        (est0, err, n_seen) = next(iter(summary.values()))
        assert n_seen == n_true
        # every phi-heavy term (true > n/(k+1)) must be present
        for t, c in truth[s].items():
            if c > n_true / (K + 1):
                assert t in summary, (s, t, c)
        # every estimate is an undercount within the emitted bound
        for t, (est, err, _) in summary.items():
            assert est <= truth[s][t] <= est + err, (s, t)


def test_streaming_flatline_matches_batch_closed_runs(spark, tmp_path):
    """Runs crossing BOTH a micro-batch boundary and a checkpoint
    restart must merge in state and emit once, equal to the batch
    census' closed qualifying runs."""
    import pyspark.sql.functions as F  # noqa: F811

    from gents_spark.operators.anomaly import flatline_runs
    from gents_spark.streaming.stateful import streaming_flatline

    in_path = str(tmp_path / "fl_in")
    out_path = str(tmp_path / "fl_out")
    ckpt = str(tmp_path / "fl_ckpt")

    batch1 = [("a", t, 5) for t in range(5)] + [
        ("b", 0, 7), ("b", 1, 7), ("b", 2, 8),
    ]
    batch2 = [("a", 5, 6)] + [("b", 3, 8), ("b", 4, 8), ("b", 5, 9)]

    def run():
        stream = (
            spark.readStream.schema("source string, t long, v long")
            .parquet(in_path)
        )
        q = (
            streaming_flatline(stream, min_run=3)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_path)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    sch = "source string, t long, v long"
    spark.createDataFrame(batch1, sch).write.mode("append").parquet(in_path)
    run()
    # a's 5-run and b's 8-run are still OPEN: nothing may emit yet
    # (b's 7-run closed at len 2 < min_run)
    import os

    emitted0 = (
        spark.read.parquet(out_path).count()
        if any(f.endswith(".parquet") for f in os.listdir(out_path))
        else 0
    )
    assert emitted0 == 0

    spark.createDataFrame(batch2, sch).write.mode("append").parquet(in_path)
    run()  # restart from checkpoint: carried runs must extend, then close

    got = {
        (r.source, r.t_start, r.t_end, r.n_buckets, r.v)
        for r in spark.read.parquet(out_path).collect()
    }
    full = spark.createDataFrame(batch1 + batch2, sch)
    # batch census, minus runs still open at end-of-data (v=6 at t5 and
    # v=9 at t5 are open AND sub-min_run; the documented reconciliation)
    expected = {
        (r.source, r.t_start, r.t_end, r.n_buckets, r.v)
        for r in flatline_runs(
            full, key="source", order_idx="t", value="v", min_run=3
        ).collect()
        if not (r.t_end == 5)
    }
    assert got == expected == {
        ("a", 0, 4, 5, 5), ("b", 2, 4, 3, 8),
    }


def test_streaming_flatline_null_row_breaks_not_poisons(spark, tmp_path):
    """A NULL v row must not fail the micro-batch (Arrow NaN -> int64
    cast): it drops, the missing bucket becomes a grid gap, and the run
    breaks on both sides — the batch twin's NULL semantics."""
    from gents_spark.streaming.stateful import streaming_flatline

    in_path = str(tmp_path / "fln_in")
    out_path = str(tmp_path / "fln_out")
    ckpt = str(tmp_path / "fln_ckpt")
    rows = (
        [("a", t, 5) for t in range(3)]
        + [("a", 3, None)]
        + [("a", t, 5) for t in range(4, 9)]
        + [("a", 9, 6)]  # closes the second run
    )
    spark.createDataFrame(
        rows, "source string, t long, v long"
    ).write.parquet(in_path)
    q = (
        streaming_flatline(
            spark.readStream.schema("source string, t long, v long")
            .parquet(in_path),
            min_run=3,
        )
        .writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(out_path)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.t_start, r.t_end, r.n_buckets, r.v)
        for r in spark.read.parquet(out_path).collect()
    }
    # run 1 (t0-2) closed by the gap at t3; run 2 (t4-8) closed by v=6
    assert got == {(0, 2, 3, 5), (4, 8, 5, 5)}
