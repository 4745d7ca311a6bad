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

    if mode == "locf":
        joined = _locf_chunked(joined, fill_cols)
    else:
        joined = _linear_chunked(joined, fill_cols)

    return (
        joined.withColumn("tier", F.lit(tier))
        .withColumn(
            "bucket_end",
            F.timestamp_add(unit.upper(), F.lit(1), F.col("bucket_start")),
        )
    )


def _linear_global(joined: DataFrame, fill_cols: list[str]) -> DataFrame:
    """Reference linear interpolation with one global window per source.

    One task per source — the straggler shape _linear_chunked exists to
    avoid.  Kept only as the equality oracle for the chunked path.
    """
    w_back = (
        Window.partitionBy("source")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
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
    return joined.drop("_ib", "_if")


def _linear_chunked(joined: DataFrame, fill_cols: list[str]) -> DataFrame:
    """Linear interpolation with (source, day-chunk) windows — exactly
    equal to the global per-source interpolation but parallel WITHIN a
    source (the same parallel-prefix decomposition as ``_locf_chunked``,
    extended to BOTH directions: each chunk needs a carry-in from
    preceding chunks AND a carry-forward from following ones).

      pass 1: within each (source, day): last-known (idx, values) behind
              each row and first-known ahead of it — wide parallelism;
      pass 2: per-(source, day) summary: the day's last/first known
              (idx, values);
      pass 3: over the tiny day-summary table, per source: carry-in =
              running last-known over preceding days, carry-forward =
              running first-known over following days;
      pass 4: broadcast-join carries back; flanking point = within-day
              value if present else carry; interpolate.
    """
    idx = F.unix_timestamp("bucket_start")
    known = ~F.col("filled")
    joined = joined.withColumn(
        "_gchunk", F.date_trunc("day", F.col("bucket_start"))
    ).withColumn("_idx", idx)
    w_back = (
        Window.partitionBy("source", "_gchunk")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("source", "_gchunk")
        .orderBy("bucket_start")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    joined = joined.withColumn(
        "_ib", F.last(F.when(known, F.col("_idx")), ignorenulls=True).over(w_back)
    ).withColumn(
        "_if", F.first(F.when(known, F.col("_idx")), ignorenulls=True).over(w_fwd)
    )
    for c in fill_cols:
        joined = joined.withColumn(
            f"_vb_{c}",
            F.last(F.when(known, F.col(c)), ignorenulls=True).over(w_back),
        ).withColumn(
            f"_vf_{c}",
            F.first(F.when(known, F.col(c)), ignorenulls=True).over(w_fwd),
        )

    # day summaries: the row at the day's max idx carries the day's
    # last-known (_ib/_vb_*), the row at min idx its first-known (_if/_vf_*)
    summ = joined.groupBy("source", "_gchunk").agg(
        F.max_by("_ib", "_idx").alias("_last_idx"),
        F.min_by("_if", "_idx").alias("_first_idx"),
        *[F.max_by(f"_vb_{c}", "_idx").alias(f"_lastv_{c}") for c in fill_cols],
        *[F.min_by(f"_vf_{c}", "_idx").alias(f"_firstv_{c}") for c in fill_cols],
    )
    w_prev = (
        Window.partitionBy("source")
        .orderBy("_gchunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("source")
        .orderBy("_gchunk")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carry = summ.select(
        "source",
        "_gchunk",
        F.last("_last_idx", ignorenulls=True).over(w_prev).alias("_cin_idx"),
        F.first("_first_idx", ignorenulls=True).over(w_next).alias("_cfwd_idx"),
        *[
            F.last(f"_lastv_{c}", ignorenulls=True)
            .over(w_prev)
            .alias(f"_cin_{c}")
            for c in fill_cols
        ],
        *[
            F.first(f"_firstv_{c}", ignorenulls=True)
            .over(w_next)
            .alias(f"_cfwd_{c}")
            for c in fill_cols
        ],
    )
    out = joined.join(F.broadcast(carry), ["source", "_gchunk"], "left")
    ib = F.coalesce(F.col("_ib"), F.col("_cin_idx"))
    fi = F.coalesce(F.col("_if"), F.col("_cfwd_idx"))
    for c in fill_cols:
        vb = F.coalesce(F.col(f"_vb_{c}"), F.col(f"_cin_{c}"))
        vf = F.coalesce(F.col(f"_vf_{c}"), F.col(f"_cfwd_{c}"))
        frac = (F.col("_idx") - ib) / (fi - ib)
        interp = vb.cast("double") + (vf.cast("double") - vb.cast("double")) * frac
        out = out.withColumn(
            c,
            F.when(~F.col("filled"), F.col(c))
            .when(fi.isNull(), vb)  # trailing edge -> LOCF
            .otherwise(interp),
        )
    drop = ["_gchunk", "_idx", "_ib", "_if", "_cin_idx", "_cfwd_idx"]
    drop += [p.format(c) for c in fill_cols for p in ("_vb_{}", "_vf_{}", "_cin_{}", "_cfwd_{}")]
    return out.drop(*drop)


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
