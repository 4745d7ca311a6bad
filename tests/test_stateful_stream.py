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
    q.awaitTermination(120)


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
        q.awaitTermination(120)

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
