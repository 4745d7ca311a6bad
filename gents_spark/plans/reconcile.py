"""Late-data reconciliation: detect + invalidate stale committed chunks.

The streaming path drops rows that arrive after the watermark
(streaming/rollup_stream.py), and a batch tier store built before a late
file landed is silently stale — in both cases the fix is the same ACTING
path GenTS uses for incomplete outputs (delete-and-rewrite,
``gents/timeseries.py:136-142``): detect the affected chunks and
invalidate their manifest entries so the next resumed build rewrites
exactly those chunks.

Detection needs no stored raw data: every committed chunk's manifest row
carries a source fingerprint — ``sum_cnt`` (source rows aggregated into
the chunk) and ``sum_tok`` (their value sum), computed over non-filled
tier rows at write time (plans/manifest.py).  Reconciliation recounts
the CURRENT source per chunk (one map-side-combined aggregation over the
prepared raw rows) and compares:

- fingerprint mismatch  -> late/changed data: append a ``stale`` row per
  affected (tier, chunk); the latest-status rule (manifest.latest_status)
  then excludes it from the resume skip-set;
- chunk missing from the manifest -> new data: already handled by the
  planned-chunks anti-join, reported here for visibility;
- chunk missing from the source -> shrunk data (deleted input files):
  reported, never auto-deleted.

``TierPipeline.reconcile`` wires this to the pipeline's own ``prepare``
(same validation/filters as the build) so detection sees exactly the
rows a rebuild would.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gents_spark.plans.manifest import (
    CHUNK_FORMATS,
    DONE,
    STALE,
    _append_manifest_rows,
    read_manifest,
)


def source_chunk_fingerprints(
    raw: DataFrame, chunk_grain: str = "day", ts_col: str = "event_time"
) -> DataFrame:
    """(chunk, src_rows, src_sum) from the prepared raw rows — the same
    quantities the writer stamped into the manifest per chunk."""
    return (
        raw.groupBy(
            F.date_format(F.col(ts_col), CHUNK_FORMATS[chunk_grain]).alias(
                "chunk"
            )
        )
        .agg(
            F.count("*").alias("src_rows"),
            F.sum(F.col("n_tok").cast("long")).alias("src_sum"),
        )
    )


def detect_stale_chunks(
    spark: SparkSession,
    raw: DataFrame,
    manifest_dir: str,
    chunk_grain: str = "day",
) -> dict:
    """Compare current source fingerprints against the latest committed
    manifest rows.  Returns
    ``{"stale": [(tier, chunk), ...], "new": [chunk, ...],
       "orphaned": [(tier, chunk), ...]}``.
    """
    m = read_manifest(spark, manifest_dir)
    committed = (
        m.groupBy("tier", "chunk")
        .agg(
            F.max_by(
                F.struct("status", "sum_cnt", "sum_tok"),
                F.struct("checkpoint_ts", "status"),
            ).alias("last")
        )
        .filter(F.col("last.status") == DONE)
        .select(
            "tier",
            "chunk",
            F.col("last.sum_cnt").alias("man_rows"),
            F.col("last.sum_tok").alias("man_sum"),
        )
    )
    src = source_chunk_fingerprints(raw, chunk_grain)
    joined = committed.join(src, "chunk", "full_outer").collect()
    stale, new, orphaned = [], set(), []
    for r in joined:
        if r["tier"] is None:
            new.add(r["chunk"])
        elif r["src_rows"] is None:
            orphaned.append((r["tier"], r["chunk"]))
        elif (
            r["man_rows"] != r["src_rows"] or r["man_sum"] != r["src_sum"]
        ):
            stale.append((r["tier"], r["chunk"]))
    return {
        "stale": sorted(stale),
        "new": sorted(new),
        "orphaned": sorted(orphaned),
    }


def invalidate_chunks(
    manifest_dir: str,
    units: list[tuple[str, str]],
    run_id: str,
    command: str | None = None,
) -> int:
    """Append a ``stale`` manifest row per (tier, chunk) — the acting
    invalidation: the latest-status rule drops them from the resume
    skip-set, so the next build rewrites them (dynamic partition
    overwrite replaces the chunk dir atomically)."""
    if not units:
        return 0
    from gents_spark import __version__

    now = time.time()
    rows = [
        (run_id, t, c, STALE, None, None, None, now, command, __version__)
        for t, c in units
    ]
    _append_manifest_rows(manifest_dir, rows)
    return len(rows)
