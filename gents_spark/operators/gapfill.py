"""LOCF / linear gap-fill over a generated bucket spine.

GenTS leaves missing timesteps absent (no analog); the north_rule adds
them.  Design (SURVEY.md §2.3 J4 / §2.5 W5):

1. spine: per source, ``sequence(min_bucket, max_bucket, interval)`` +
   ``explode`` — one row per expected bucket.  The sequence is built per
   source (one row -> array -> explode), so no driver-side loop and no
   cross-source blow-up.
2. left join tiers onto the spine on (source, bucket_start).  This is an
   equi-join whose left side is tiny relative to raw data; broadcast is
   NOT forced because at 10^12 scale the tier table itself is large —
   AQE picks the strategy.
3. LOCF = ``last(value, ignorenulls=True)`` over an unbounded-preceding
   window per source; linear = interpolation between the last and next
   known values using bucket indices.

Scale note: the window is partitioned by source and ordered by bucket —
a single shuffle on source.  Sources with pathologically many buckets
are bounded by retention (buckets/source is time-bounded, not
data-bounded), so the per-partition sort is safe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gents_spark.operators.rollup import TIER_UNITS

_FILL_COLS = ["cnt", "sum_tok", "min_tok", "max_tok", "p50_tok", "p95_tok", "p99_tok"]


def bucket_spine(tiers: DataFrame, tier: str) -> DataFrame:
    """Per-source dense spine of bucket_start values (min..max)."""
    unit = TIER_UNITS[tier]
    return (
        tiers.groupBy("source")
        .agg(
            F.min("bucket_start").alias("_lo"),
            F.max("bucket_start").alias("_hi"),
        )
        .select(
            "source",
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"interval 1 {unit}"))
            ).alias("bucket_start"),
        )
    )


def gapfill(
    tiers: DataFrame,
    tier: str,
    mode: str = "locf",
    fill_cols: list[str] | None = None,
) -> DataFrame:
    """Fill missing buckets; adds ``filled`` boolean.

    ``mode='locf'``: last observation carried forward.
    ``mode='linear'``: straight-line interpolation between flanking known
    buckets (falls back to LOCF at the trailing edge; leading-edge rows
    before the first observation stay null in both modes only if the
    spine starts before data — it does not, spine is min..max).
    """
    if mode not in ("locf", "linear"):
        raise ValueError(f"unknown gapfill mode: {mode}")
    fill_cols = fill_cols or [c for c in _FILL_COLS if c in tiers.columns]
    unit = TIER_UNITS[tier]

    spine = bucket_spine(tiers, tier)
    joined = spine.join(
        tiers, ["source", "bucket_start"], "left"
    ).withColumn("filled", F.col("cnt").isNull())

    w_back = (
        Window.partitionBy("source")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    if mode == "locf":
        joined = _locf_chunked(joined, fill_cols)
    else:
        w_fwd = (
            Window.partitionBy("source")
            .orderBy("bucket_start")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        idx = F.unix_timestamp("bucket_start")
        known_idx_b = F.last(
            F.when(~F.col("filled"), idx), ignorenulls=True
        ).over(w_back)
        known_idx_f = F.first(
            F.when(~F.col("filled"), idx), ignorenulls=True
        ).over(w_fwd)
        joined = joined.withColumn("_ib", known_idx_b).withColumn("_if", known_idx_f)
        for c in fill_cols:
            vb = F.last(
                F.when(~F.col("filled"), F.col(c)), ignorenulls=True
            ).over(w_back)
            vf = F.first(
                F.when(~F.col("filled"), F.col(c)), ignorenulls=True
            ).over(w_fwd)
            frac = (idx - F.col("_ib")) / (F.col("_if") - F.col("_ib"))
            interp = vb.cast("double") + (vf.cast("double") - vb.cast("double")) * frac
            joined = joined.withColumn(
                c,
                F.when(~F.col("filled"), F.col(c))
                .when(F.col("_if").isNull(), vb)  # trailing edge -> LOCF
                .otherwise(interp),
            )
        joined = joined.drop("_ib", "_if")

    return (
        joined.withColumn("tier", F.lit(tier))
        .withColumn(
            "bucket_end",
            F.timestamp_add(unit.upper(), F.lit(1), F.col("bucket_start")),
        )
    )


def _locf_chunked(joined: DataFrame, fill_cols: list[str]) -> DataFrame:
    """LOCF with (source, day-chunk) window partitioning — exactly equal
    to a global per-source LOCF but parallel WITHIN a source.

    A single per-source running window serializes each source into one
    task; a long-retention source (years of minute buckets) becomes the
    straggler.  Instead:

      pass 1: LOCF within each (source, day) — wide parallelism;
      pass 2: per-(source, day) last-known value (row at max bucket);
      pass 3: running LOCF over the tiny day-summary table gives each
              day its carry-in from all previous days;
      pass 4: broadcast-join the carry-in back; coalesce.

    This is the classic two-level scan decomposition of a prefix
    operator (LOCF is a running ``last(ignorenulls)``, which is
    associative) — the same trick as parallel prefix sums.
    """
    chunk = F.date_trunc("day", F.col("bucket_start")).alias("_gchunk")
    joined = joined.withColumn("_gchunk", chunk)
    w1 = (
        Window.partitionBy("source", "_gchunk")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in fill_cols:
        joined = joined.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w1))

    summaries = joined.groupBy("source", "_gchunk").agg(
        *[F.max_by(F.col(c), F.col("bucket_start")).alias(f"_last_{c}")
          for c in fill_cols]
    )
    w2 = (
        Window.partitionBy("source")
        .orderBy("_gchunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summaries.select(
        "source",
        "_gchunk",
        *[
            F.last(F.col(f"_last_{c}"), ignorenulls=True)
            .over(w2)
            .alias(f"_carry_{c}")
            for c in fill_cols
        ],
    )
    out = joined.join(F.broadcast(carry), ["source", "_gchunk"], "left")
    for c in fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_carry_{c}")))
    return out.drop("_gchunk", *[f"_carry_{c}" for c in fill_cols])
