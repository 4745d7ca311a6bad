"""Retention expiry: drop raw/fine tiers past their retention window (M2).

GenTS has no retention (outputs live forever); north_rule requires tiered
expiry — the classic downsampling contract: finer tiers are only kept for
a bounded trailing window, coarser tiers longer.  "Generate before you
delete": a tier chunk may only be expired once every coarser tier
covering it is committed in the manifest (GenTS's integrity mindset,
``gents/timeseries.py:136-142``).

On Iceberg this is ``DELETE FROM tiers WHERE tier=... AND bucket_end <
cutoff`` + ``expire_snapshots``; on the parquet sandbox layout
(tier=X/chunk=YYYY-MM-DD) it is partition-directory removal — pure
metadata, no data rewrite, which is the property that matters at 100 TB.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from gents_spark.plans.manifest import DONE, latest_status, read_manifest

#: default retention horizon per tier (days of bucket age)
DEFAULT_RETENTION_DAYS = {"raw": 7, "1m": 30, "1h": 365, "1d": 36500}


def _grain_step(tier: str) -> int:
    """Bucket width in seconds; 'raw' sorts below every real grain."""
    if tier == "raw":
        return 0
    from gents_spark.operators.rollup import tier_grain

    return tier_grain(tier)[1]


def _coarser_committed(m, tier: str) -> list[str]:
    """All committed tiers strictly coarser than ``tier`` — the covers
    'generate before you delete' gates on.  Generalizes the old fixed
    raw->1m->1h->1d chain to custom ``<N>s`` grains by GRAIN WIDTH:
    a chunk may expire once ANY committed coarser tier covers it (a
    partial intermediate tier therefore cannot block expiry that a
    complete coarser one justifies).

    Empty-list semantics (decided here, enforced by the caller): a
    tier with no coarser committed tier is the TOP of its deployment's
    cascade and expires UNGATED — but only when a FINER committed tier
    exists to rebuild it from (the old ``COARSER['1d'] is None`` rule,
    now deployment-relative: a custom weekly coarsest tier is
    reclaimable too).  A single-tier deployment (900s alone, raw
    alone) has nothing to rebuild from, so nothing may expire."""
    step = _grain_step(tier)
    present = [r["tier"] for r in m.select("tier").distinct().collect()]
    return [t for t in present if _grain_step(t) > step]


def _has_finer_committed(m, tier: str) -> bool:
    step = _grain_step(tier)
    present = [r["tier"] for r in m.select("tier").distinct().collect()]
    return any(_grain_step(t) < step for t in present)


def expirable_chunks(
    spark: SparkSession,
    manifest_dir: str,
    tier: str,
    cutoff_date: str,
) -> list[str]:
    """Chunks fully older than cutoff whose coarser tier is committed.

    A chunk is expirable only when its entire covered range lies strictly
    before the cutoff: lexicographic ``chunk < cutoff`` over-deletes for
    coarse grains ('2026-01' < '2026-01-15' would expire the whole month,
    including buckets after the 15th).  The chunk's grain is recovered
    from its key length (10=day, 7=month, 4=year) and its exclusive end
    date compared to the cutoff instead.
    """
    # latest-status rule: a chunk invalidated by reconciliation (stale)
    # is NOT done — neither expirable itself nor valid coarser cover
    m = latest_status(read_manifest(spark, manifest_dir)).filter(
        F.col("status") == DONE
    )
    chunk_end = (
        F.when(F.length("chunk") == 10, F.date_add(F.to_date("chunk"), 1))
        .when(
            F.length("chunk") == 7,
            F.add_months(F.to_date(F.concat(F.col("chunk"), F.lit("-01"))), 1),
        )
        .otherwise(
            F.add_months(
                F.to_date(F.concat(F.col("chunk"), F.lit("-01-01"))), 12
            )
        )
    )
    mine = m.filter(
        (F.col("tier") == tier) & (chunk_end <= F.to_date(F.lit(cutoff_date)))
    )
    coarser = _coarser_committed(m, tier)
    if coarser:
        covered = (
            m.filter(F.col("tier").isin(coarser))
            .select("chunk")
            .distinct()
        )
        mine = mine.join(covered, "chunk", "left_semi")
    elif not _has_finer_committed(m, tier):
        # single-tier deployment: the only copy of the data never
        # expires ('generate before you delete' has nowhere to point)
        return []
    # else: `tier` tops a real cascade (finer tiers can rebuild it) —
    # top-tier semantics, expiry ungated
    return sorted(r["chunk"] for r in mine.select("chunk").distinct().collect())


def expire(
    spark: SparkSession,
    tiers_dir: str,
    manifest_dir: str,
    tier: str,
    cutoff_date: str,
) -> list[str]:
    """Remove expired chunk partitions; returns removed chunk keys."""
    datetime.strptime(cutoff_date, "%Y-%m-%d")  # validate
    removed = []
    for chunk in expirable_chunks(spark, manifest_dir, tier, cutoff_date):
        path = os.path.join(tiers_dir, f"tier={tier}", f"chunk={chunk}")
        if os.path.isdir(path):
            shutil.rmtree(path)
            removed.append(chunk)
    return removed
