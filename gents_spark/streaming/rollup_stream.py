"""Streaming continuous aggregates (SURVEY.md §2.9).

GenTS is pure batch; the north_rule's "continuous aggregates" map onto
Structured Streaming for live ingest: readStream over the sequences
table directory -> event-time derivation -> watermarked tumbling-window
aggregation -> append-mode sink.

Semantics parity with the batch tier: same bucket assignment
(``window(event_time, ...)`` start == ``date_trunc``) and the same
additive stats.  Exact percentiles are a batch-only feature (streaming
state cannot hold all values unboundedly); streaming emits the additive
stats and leaves percentiles to the batch cascade — the classic
lambda-ish split, documented rather than hidden.

Late data: the watermark bounds state; a row later than the watermark is
dropped by the stream and reconciled by the next batch tier rebuild of
that chunk (manifest invalidation path), mirroring GenTS's
delete-and-rewrite of incomplete outputs (``gents/timeseries.py:136-142``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gents_spark.operators.rollup import tier_grain
from gents_spark.timeparse import with_event_time

SEQUENCES_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string"
)

WINDOW_WIDTH = {
    "1m": "1 minute", "1h": "1 hour", "1d": "1 day", "1w": "7 days",
}
#: F.window durations are EPOCH-aligned; 1970-01-01 is a Thursday, so
#: '7 days' windows need a +4d startTime to match date_trunc('week')'s
#: Monday anchor (the batch '1w' tier).  Sub-day widths divide a day
#: and already coincide.
WINDOW_START = {"1w": "4 days"}


def read_sequences_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(SEQUENCES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_rollup(
    stream: DataFrame,
    tier: str = "1m",
    step_s: int = 10,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window continuous aggregate.

    Accepts the named tiers plus ``<N>s`` custom grains (r05):
    ``F.window``'s duration windows are epoch-aligned like
    ``time_bucket``'s default origin, and for the calendar widths they
    coincide with ``date_trunc`` — so streamed buckets always line up
    with the batch tier of the same label.
    """
    _, step = tier_grain(tier)  # validates the label
    width = WINDOW_WIDTH.get(tier, f"{step} seconds")
    start = WINDOW_START.get(tier)
    w = (
        F.window("event_time", width, width, start)
        if start
        else F.window("event_time", width)
    )
    ev = with_event_time(stream, step_s=step_s).withWatermark(
        "event_time", watermark
    )
    return (
        ev.groupBy("source", w)
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("n_tok").cast("long")).alias("sum_tok"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
        )
        .select(
            "source",
            F.lit(tier).alias("tier"),
            F.col("window.start").alias("bucket_start"),
            F.col("window.end").alias("bucket_end"),
            "cnt", "sum_tok", "min_tok", "max_tok",
        )
    )


def run_stream_to_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    tier: str = "1m",
    step_s: int = 10,
    watermark: str = "10 minutes",
):
    """Start the stream; caller awaits/ stops.  Append mode: a window is
    emitted once, after the watermark passes it (exactly-once with the
    checkpoint dir — the streaming twin of the lineage manifest)."""
    q = streaming_rollup(
        read_sequences_stream(spark, in_path),
        tier=tier,
        step_s=step_s,
        watermark=watermark,
    )
    return (
        q.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_tier_ingest(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    checkpoint: str,
    tier: str = "1m",
    step_s: int = 10,
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 8,
):
    """Streaming tier MAINTENANCE (r05): the watermarked continuous
    aggregate lands directly in the batch pipeline's chunked
    tiers/ + manifest layout via ``plans.manifest.append_tier_increment``
    — one engine, one table, both write paths.

    Append-mode emission means each window arrives exactly once
    (post-watermark); the foreachBatch sink is idempotent per micro-
    batch through the manifest run_id guard, and any chunk streaming
    touches is demoted from ``done`` so the next batch resume
    consolidates it (see append_tier_increment's contract).  Start with
    ``trigger(availableNow)`` for catch-up runs or remove the trigger
    for continuous service; caller awaits/stops the returned query.
    """
    import os

    from gents_spark.plans.manifest import append_tier_increment

    tiers_dir = os.path.join(out_dir, "tiers")
    manifest_dir = os.path.join(out_dir, "manifest")
    q = streaming_rollup(
        read_sequences_stream(spark, in_path, max_files_per_trigger),
        tier=tier,
        step_s=step_s,
        watermark=watermark,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_tier_increment(
            batch_df.sparkSession,
            batch_df,
            tier,
            tiers_dir,
            manifest_dir,
            run_id=f"stream-{tier}-{batch_id}",
        )

    return (
        q.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
