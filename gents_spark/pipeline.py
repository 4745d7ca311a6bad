"""End-to-end tier pipeline: ingest -> raw agg -> gap-fill -> payloads ->
checkpointed writes -> cascade -> retention (SURVEY.md §3.4 lifecycle).

The GenTS lifecycle (``gents/cli.py:121-206``: discover -> filter -> slice
-> plan orders -> parallel execute with integrity-skip) becomes a sequence
of DataFrame jobs with a manifest checkpoint between tiers.
"""

from __future__ import annotations

import os
import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gents_spark.operators.gapfill import gapfill
from gents_spark.operators.rollup import TIER_ORDER, rollup
from gents_spark.operators.skew import hot_sources, salted_rollup
from gents_spark.plans.manifest import read_tier, write_tier_chunks
from gents_spark.timeparse import (
    split_modal_fingerprint,
    split_valid,
    with_event_time,
)


class TierPipeline:
    """Configured run over one sequences table.

    Parameters mirror the GenTS fluent surface (include/exclude sources ~
    ``HFCollection.include/exclude``, hfcollection.py:784-835; tier list ~
    slice config; resume ~ integrity skip).
    """

    def __init__(
        self,
        spark: SparkSession,
        step_s: int = 10,
        tiers: list[str] | None = None,
        gapfill_mode: str | None = "locf",
        include_sources: list[str] | None = None,
        exclude_sources: list[str] | None = None,
        salt_threshold_frac: float = 0.25,
        n_salt: int = 16,
        payloads: str | None = "coarse",
        validate: bool = True,
        use_salting: bool = False,
        chunk_grain: str = "day",
        compression: str = "snappy",
        percentile_mode: str = "exact",
        modal_quarantine: bool = False,
    ):
        if payloads not in (None, "coarse", "all"):
            raise ValueError("payloads must be None, 'coarse', or 'all'")
        self.spark = spark
        self.step_s = step_s
        self.tiers = tiers or TIER_ORDER
        self.gapfill_mode = gapfill_mode
        self.include_sources = include_sources
        self.exclude_sources = exclude_sources
        self.salt_threshold_frac = salt_threshold_frac
        self.n_salt = n_salt
        self.payloads = payloads
        self.validate = validate
        self.use_salting = use_salting
        self.chunk_grain = chunk_grain
        self.compression = compression
        self.percentile_mode = percentile_mode
        self.modal_quarantine = modal_quarantine

    def prepare(self, sequences: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Validate + filter + derive event_time. Returns (raw, quarantined).

        ``validate=False`` skips the per-row ``n_tok == size(tokens)``
        check: that predicate forces every downstream scan to decode the
        full ``tokens`` arrays (the widest column by far), turning a
        3-column pruned read into a whole-table read.  The GenTS model is
        the same — validity is checked once at metadata pull
        (``hfcollection.py:744-766``), not on every access; run a
        validated-ingest job once, then build tiers with validate=False.
        """
        if self.validate:
            valid, bad = split_valid(sequences)
        else:
            valid = sequences
            bad = sequences.limit(0)
        if self.modal_quarantine:
            # F7 as an engine op: drop structural-fingerprint outliers
            # per source when a strict-majority fingerprint exists
            # (GenTS filter_by_variables, hfcollection.py:349-355)
            valid, fp_out = split_modal_fingerprint(valid)
            bad = bad.unionByName(fp_out)
        if self.include_sources:
            valid = valid.filter(F.col("source").isin(self.include_sources))
        if self.exclude_sources:
            valid = valid.filter(~F.col("source").isin(self.exclude_sources))
        # doc_id is kept only for the salted path (it seeds the
        # deterministic salt, computed map-side before any shuffle).
        cols = ["source", "event_time", "n_tok"]
        if self.use_salting:
            cols = ["doc_id", *cols]
        raw = with_event_time(valid, step_s=self.step_s).select(*cols)
        return raw, bad

    def _planned_chunks(self, raw: DataFrame) -> list[str]:
        """All checkpoint chunks the raw time range touches."""
        from datetime import timedelta

        from gents_spark.plans.manifest import CHUNK_FORMATS

        lo, hi = raw.agg(
            F.min("event_time"), F.max("event_time")
        ).collect()[0]
        if lo is None:
            # Empty prepared input (all rows quarantined or filtered out):
            # nothing to plan.
            return []
        fmt = {"day": "%Y-%m-%d", "month": "%Y-%m", "year": "%Y"}[
            self.chunk_grain
        ]
        assert CHUNK_FORMATS[self.chunk_grain]  # grains stay in sync
        out = []
        cur = lo
        while cur.strftime(fmt) <= hi.strftime(fmt):
            out.append(cur.strftime(fmt))
            if self.chunk_grain == "day":
                cur = cur + timedelta(days=1)
            elif self.chunk_grain == "month":
                cur = (cur.replace(day=1) + timedelta(days=32)).replace(day=1)
            else:
                cur = cur.replace(year=cur.year + 1, month=1, day=1)
        return out

    def run(
        self,
        sequences: DataFrame,
        out_dir: str,
        resume: bool = True,
        run_id: str | None = None,
        fail_after_chunks: int | None = None,
        command: str | None = None,
    ) -> dict:
        """Full raw->1m->1h->1d build with per-tier checkpointing.

        Returns metrics: per-tier written/skipped chunk counts + row counts.
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        tiers_dir = os.path.join(out_dir, "tiers")
        manifest_dir = os.path.join(out_dir, "manifest")
        raw, bad = self.prepare(sequences)
        raw = raw.persist()
        try:
            metrics: dict = {"run_id": run_id, "tiers": {}}
            if self.validate or self.modal_quarantine:
                n_bad = bad.count()
                metrics["quarantined_rows"] = n_bad
                if n_bad:
                    # quarantined rows are data, not log lines: they land
                    # in their own table for later inspection/repair
                    # (GenTS returns the outlier set, hfcollection.py:358)
                    bad.write.mode("overwrite").parquet(
                        os.path.join(out_dir, "quarantine")
                    )
            # Salting note: the tier groupBy keys on (source, bucket) — a
            # HIGH-cardinality key even when one source is hot, because a
            # hot source's rows spread over its many buckets (rows per
            # key are time-bounded).  So the default single aggregation
            # is already skew-safe here, and the exact-percentile pass
            # cannot be salted regardless (needs all of a bucket's values
            # together).  use_salting=True switches the additive stats to
            # the two-phase salted plan (operators/skew.py) — the right
            # tool when buckets are coarse relative to the data (e.g. a
            # 1d-only build over a few hot sources).
            hot = (
                hot_sources(raw, self.salt_threshold_frac)
                if self.use_salting
                else []
            )
            # chunk plan from the raw time range — ONE tiny job, shared by
            # every tier; lets an all-done resume skip tier computation
            planned_chunks = self._planned_chunks(raw)
            if not planned_chunks:
                for tier in self.tiers:
                    metrics["tiers"][tier] = {
                        "written": 0,
                        "skipped": 0,
                        "rows_written": 0,
                        "rows": 0,
                        "seconds": 0.0,
                    }
                return metrics
            prev_tier_name: str | None = None
            for tier in self.tiers:
                if hot:
                    additive = salted_rollup(raw, tier, n_salt=self.n_salt)
                    pct = rollup(
                        raw, tier, percentile_mode=self.percentile_mode
                    ).select(
                        "source", "bucket_start", "p50_tok", "p95_tok", "p99_tok"
                    )
                    tier_df = additive.join(pct, ["source", "bucket_start"])
                else:
                    tier_df = rollup(
                        raw, tier, percentile_mode=self.percentile_mode
                    )
                if self.payloads and (
                    prev_tier_name is not None or self.payloads == "all"
                ):
                    # Gorilla/DoD payload: the finer value stream encoded
                    # per coarser bucket — raw n_tok stream for the finest
                    # tier (payloads='all' only: one pandas-UDF row per
                    # bucket is wasteful at minute grain), the previously
                    # WRITTEN tier's sum_tok stream above it.  Reading the
                    # finer tier back from disk keeps each tier's job DAG
                    # flat (composing from the in-memory lineage would
                    # re-run every finer tier's full pipeline inside this
                    # tier's plan).
                    from gents_spark.functions.codec_udfs import attach_payload

                    if prev_tier_name is None:
                        pay = attach_payload(
                            raw, tier, value_col="n_tok", ts_col="event_time"
                        )
                    else:
                        finer = read_tier(self.spark, tiers_dir, prev_tier_name)
                        if "filled" in finer.columns:
                            finer = finer.filter(~F.col("filled"))
                        pay = attach_payload(finer, tier)
                    tier_df = tier_df.join(
                        pay.select("source", "bucket_start", "payload"),
                        ["source", "bucket_start"],
                        "left",
                    )
                if self.gapfill_mode:
                    tier_df = gapfill(tier_df, tier, mode=self.gapfill_mode)
                else:
                    tier_df = tier_df.withColumn("filled", F.lit(False))
                t0 = time.time()
                m = write_tier_chunks(
                    self.spark,
                    tier_df,
                    tier,
                    tiers_dir,
                    manifest_dir,
                    run_id,
                    resume=resume,
                    fail_after_chunks=fail_after_chunks,
                    chunk_grain=self.chunk_grain,
                    planned_chunks=planned_chunks,
                    command=command,
                    compression=self.compression,
                )
                m["rows"] = m["rows_written"]
                m["seconds"] = round(time.time() - t0, 3)
                metrics["tiers"][tier] = m
                prev_tier_name = tier
            return metrics
        finally:
            raw.unpersist()
