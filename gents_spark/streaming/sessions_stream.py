"""Streaming sessionization (SURVEY.md §2.9 x sessions.py).

The batch operator (operators/sessions.py::sessionize) is a lag+cumsum
window pass; its streaming twin uses Spark's NATIVE session windows —
``F.session_window(ts, gap)`` — whose state store merges windows as
events arrive and emits a session once the watermark passes its close
(append mode = emit-once, the streaming analog of the lineage
manifest's exactly-once chunk commit).

Boundary semantics vs batch: session windows are half-open
[first_ts, last_ts + gap); an event at EXACTLY gap distance starts a
new streaming session but continues a batch session (batch splits on
``gap > gap_s`` strictly).  Real event times land on the boundary with
probability ~0; the stream==batch test uses data away from it.

Late data: rows older than the watermark are dropped by the state
store; the batch reconcile path (plans/reconcile.py) detects and
rebuilds affected outputs, same as for tumbling-window rollups.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EVENTS_SCHEMA = "user_id bigint, ts timestamp, value double"


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_sessionize(
    stream: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    value: str | None = "value",
) -> DataFrame:
    """Per-(key, session) aggregates over native session windows.

    Output matches batch ``session_stats`` columns (minus the ordinal
    ``session_seq``, which is inherently batch — a stream emits sessions
    as they close, not numbered per key): session_start == min event ts
    (== window.start), session_end == max event ts, n_events, sum_val.
    """
    ev = stream.withWatermark(ts, watermark)
    aggs = [
        F.count("*").alias("n_events"),
        F.max(ts).alias("session_end"),
    ]
    if value is not None:
        aggs.append(F.round(F.sum(value), 6).alias("sum_val"))
    return (
        ev.groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(*aggs)
        .select(
            F.col(key),
            F.col("session_window.start").alias("session_start"),
            "session_end",
            "n_events",
            *([
                "sum_val",
            ] if value is not None else []),
        )
    )


def run_sessions_stream_to_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
):
    """Start the availableNow session stream; caller awaits/stops."""
    q = streaming_sessionize(
        read_events_stream(spark, in_path), gap=gap, watermark=watermark
    )
    return (
        q.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
