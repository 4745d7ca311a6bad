"""Streaming exact dedup: drop already-seen documents as they arrive.

A live training-data pipeline dedups INCOMING documents against what it
has already accepted (batch dedup of a static corpus is
operators/dedup.py).  Structured Streaming's keyed dedup state does
exactly this: ``dropDuplicatesWithinWatermark`` keeps one state entry
per content fingerprint and drops later arrivals, expiring entries once
the watermark passes — so state is bounded by the dedup horizon instead
of growing with the corpus.

Semantics: FIRST-SEEN-WINS within the watermark horizon.  A duplicate
arriving later than the horizon is admitted again (the trade that
bounds state); a full-history exact dedup is the batch operator's job,
and the standard deployment runs this stream for the hot path with a
periodic batch sweep — the same lambda-ish split as
rollup_stream.py's percentile note.

The fingerprint is md5 over the token array (content-addressed, the
hinted per-row invariant is token-array equality), not doc_id — shard
re-emissions of the same content dedup too.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gents_spark.timeparse import with_event_time


def token_fingerprint(tokens_col: str = "tokens") -> F.Column:
    """Content fingerprint: md5 over the comma-joined token array.

    Pure column expression (cast + concat_ws + md5) — stays in codegen;
    array order is significant (token-array equality, not bag
    equality).
    """
    return F.md5(
        F.concat_ws(",", F.col(tokens_col).cast("array<string>"))
    )


def streaming_dedup(
    stream: DataFrame,
    step_s: int = 10,
    watermark: str = "10 minutes",
    tokens_col: str = "tokens",
) -> DataFrame:
    """First-seen-wins streaming dedup on the token-content fingerprint.

    Event time derives from the record itself (timeparse) and the
    watermark both bounds dedup state AND defines the dedup horizon.
    Output = input schema + ``fingerprint`` (kept so downstream joins /
    audits can reference the dedup key).
    """
    ev = with_event_time(stream, step_s=step_s)
    s = ev.withColumn(
        "fingerprint", token_fingerprint(tokens_col)
    ).withWatermark("event_time", watermark)
    return s.dropDuplicatesWithinWatermark(["fingerprint"])
