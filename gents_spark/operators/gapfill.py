"""LOCF / linear gap-fill by direct gap GENERATION (lead + explode).

GenTS leaves missing timesteps absent (no analog); the north_rule adds
them.  Design (SURVEY.md §2.3 J4 / §2.5 W5):

Every input tier row looks at the NEXT known bucket of its source
(``lead`` over a (source, day-chunk) window, with a tiny day-summary
carry for chunk boundaries) and directly GENERATES the missing buckets
between them (``sequence(1, gap_n)`` + ``explode``), carrying its own
values (LOCF) or interpolating toward the next row's (linear).  Output
= original rows (``filled=false``) UNION generated rows
(``filled=true``) — identical to a dense min..max spine.

Why not the textbook spine-join (materialize a dense per-source
sequence of buckets, left-join the tier onto it, window-fill the
nulls)?  Cost: that is TWO full shuffles for the join (both sides) plus
ANOTHER full shuffle for the fill window, and it materializes a
null-padded dense table even when the data is 99% dense.  The generator
is ONE window shuffle + map-side explode; rows are created only where
gaps exist.  Measured on the bench tier: ~3x faster.  The old spine
path is kept below (``bucket_spine`` + the ``_locf_chunked`` /
``_linear_chunked`` fillers) as the equality reference for tests.

Scale note: windows are partitioned by (source, day) — parallel WITHIN
a source (a long-retention source is not one straggler task); the
boundary carry travels through a day-summary table that is ~|days x
sources| rows, broadcast back.
"""

from __future__ import annotations


import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# tier_grain accepts named tiers + '<N>s' labels, so gap-fill composes
# with rollup.time_bucket grids (gapfill(g, '900s') == 15-min resample;
# alignment only needs bucket_starts congruent mod step)
from gents_spark.operators.rollup import (  # noqa: F401 (re-exports)
    TIER_SECONDS,
    TIER_UNITS,
    tier_grain,
)


_FILL_COLS = ["cnt", "sum_tok", "min_tok", "max_tok", "p50_tok", "p95_tok", "p99_tok"]
#: the subset where "empty bucket == 0" is true (zero-fill default)
_ADDITIVE_COLS = ["cnt", "sum_tok"]


def bucket_spine(tiers: DataFrame, tier: str) -> DataFrame:
    """Per-source dense spine of bucket_start values (min..max)."""
    unit, step = tier_grain(tier)
    iv = f"interval 1 {unit}" if unit else f"interval {step} second"
    return (
        tiers.groupBy("source")
        .agg(
            F.min("bucket_start").alias("_lo"),
            F.max("bucket_start").alias("_hi"),
        )
        .select(
            "source",
            F.explode(
                F.sequence("_lo", "_hi", F.expr(iv))
            ).alias("bucket_start"),
        )
    )


def gapfill(
    tiers: DataFrame,
    tier: str,
    mode: str = "locf",
    fill_cols: list[str] | None = None,
    gchunk_col: str | None = None,
) -> DataFrame:
    """Fill missing buckets; adds ``filled`` boolean.

    ``mode='locf'``: last observation carried forward.
    ``mode='linear'``: straight-line interpolation between flanking known
    buckets (falls back to LOCF at the trailing edge; leading-edge rows
    before the first observation stay null in both modes only if the
    spine starts before data — it does not, spine is min..max).
    ``mode='zero'``: generated buckets carry 0 — the CORRECT fill for
    absence-means-zero count/sum metrics (carrying yesterday's event
    count over a dead hour via LOCF invents traffic; TimescaleDB users
    reach for ``coalesce(..., 0)`` around ``time_bucket_gapfill`` for
    exactly this).  Fill columns keep their input types.  Zero only
    makes sense for ADDITIVE columns — min/max/percentiles of an empty
    bucket are undefined, not 0 — so when ``fill_cols`` is defaulted,
    zero mode fills only ``cnt``/``sum_tok`` and the other default
    stats stay NULL on generated rows; pass ``fill_cols`` explicitly to
    widen (on your own semantics).

    ``gchunk_col``: an existing day-grain column to use as the window
    chunk instead of recomputing ``date_trunc('day', bucket_start)``.
    Same values, but reusing the ATTRIBUTE lets Catalyst see that an
    input already hash-partitioned on ``(source, gchunk_col)`` satisfies
    the window's clustering — the lead/gap-generation window then needs
    only a sort, no exchange.  The column is consumed, not emitted.
    """
    if mode not in ("locf", "linear", "zero"):
        raise ValueError(f"unknown gapfill mode: {mode}")
    if fill_cols is None and mode == "zero":
        fill_cols = [c for c in _ADDITIVE_COLS if c in tiers.columns]
    fill_cols = fill_cols or [c for c in _FILL_COLS if c in tiers.columns]
    unit, step = tier_grain(tier)

    keep_cols = [
        c for c in tiers.columns if c not in ("tier", "bucket_end", gchunk_col)
    ]
    gchunk = (
        F.col(gchunk_col)
        if gchunk_col
        else F.date_trunc("day", F.col("bucket_start"))
    )
    t = (
        tiers.select(*keep_cols, gchunk.alias("_gchunk"))
        .withColumn("_idx", F.unix_timestamp("bucket_start"))
    )
    w = Window.partitionBy("source", "_gchunk").orderBy("bucket_start")
    t = t.withColumn("_nidx", F.lead("_idx").over(w))
    if mode == "linear":
        # LOCF generates gap rows from the anchor's own values; the
        # next-row value columns are only read by the linear branch
        for c in fill_cols:
            t = t.withColumn(f"_n_{c}", F.lead(c).over(w))

    # chunk-boundary carry: first known row of the FOLLOWING days.
    # LOCF only needs the next known INDEX (to bound gap_n); the next
    # known VALUES are read only by the linear interpolation.
    carry_vals = fill_cols if mode == "linear" else []
    summ = t.groupBy("source", "_gchunk").agg(
        F.min("_idx").alias("_fidx"),
        *[F.min_by(c, "_idx").alias(f"_f_{c}") for c in carry_vals],
    )
    w_next = (
        Window.partitionBy("source")
        .orderBy("_gchunk")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carry = summ.select(
        "source",
        "_gchunk",
        F.first("_fidx").over(w_next).alias("_cidx"),
        *[
            F.first(f"_f_{c}").over(w_next).alias(f"_c_{c}")
            for c in carry_vals
        ],
    )
    t = t.join(F.broadcast(carry), ["source", "_gchunk"], "left")
    eff_nidx = F.coalesce(F.col("_nidx"), F.col("_cidx"))
    gap_n = F.when(
        eff_nidx.isNotNull(),
        ((eff_nidx - F.col("_idx")) / F.lit(step)).cast("long") - 1,
    ).otherwise(F.lit(0))

    gen = (
        t.withColumn("_gapn", gap_n)
        .filter(F.col("_gapn") >= 1)
        .withColumn("_k", F.explode(F.sequence(F.lit(1), F.col("_gapn"))))
    )
    gen_cols = [
        F.col("source"),
        (F.col("_idx") + F.col("_k") * F.lit(step))
        .cast("timestamp")
        .alias("bucket_start"),
        F.lit(True).alias("filled"),
    ]
    if mode == "locf":
        gen_cols += [F.col(c).alias(c) for c in fill_cols]
        orig_cols = [F.col(c) for c in fill_cols]
    elif mode == "zero":
        gen_cols += [
            F.lit(0).cast(tiers.schema[c].dataType).alias(c)
            for c in fill_cols
        ]
        orig_cols = [F.col(c) for c in fill_cols]
    else:
        # same arithmetic as the windowed reference: frac over unix secs,
        # double interpolation -> known rows also become double
        frac = (F.col("_k") * F.lit(step)) / (eff_nidx - F.col("_idx"))
        gen_cols += [
            (
                F.col(c).cast("double")
                + (
                    F.coalesce(F.col(f"_n_{c}"), F.col(f"_c_{c}")).cast(
                        "double"
                    )
                    - F.col(c).cast("double")
                )
                * frac
            ).alias(c)
            for c in fill_cols
        ]
        orig_cols = [F.col(c).cast("double").alias(c) for c in fill_cols]
    gen = gen.select(*gen_cols)

    extra = [
        c for c in keep_cols
        if c not in ("source", "bucket_start", *fill_cols)
    ]
    if extra:
        # non-filled passthrough columns (e.g. payload) are null on
        # generated rows, as with the spine join
        gen = gen.select(
            "*", *[F.lit(None).cast(tiers.schema[c].dataType).alias(c)
                   for c in extra]
        )
    original = tiers.select(
        "source",
        "bucket_start",
        F.lit(False).alias("filled"),
        *orig_cols,
        *[F.col(c) for c in extra],
    )
    out = original.unionByName(gen)

    end = (
        F.timestamp_add(unit.upper(), F.lit(1), F.col("bucket_start"))
        if unit
        else F.timestamp_add("SECOND", F.lit(step), F.col("bucket_start"))
    )
    return out.withColumn("tier", F.lit(tier)).withColumn(
        "bucket_end", end
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


def gap_report(
    tier: DataFrame,
    tier_name: str = "1h",
    key: str = "source",
    ts: str = "bucket_start",
) -> DataFrame:
    """Per-key gap census over a tier — the PLANNING half of gap-fill:
    before generating LOCF/linear rows (``gapfill``), report how much
    would be generated and where the damage is (a source with one
    3-hour hole needs reconciliation; one missing every 7th bucket is a
    cadence mismatch — compare FIXTURES.md ``gaps`` scenario).

    Per key, over the bucket span [min, max]:

    - ``n_present`` observed buckets, ``n_expected`` the dense count
      ``(max - min)/step + 1``, ``n_missing`` their difference;
    - ``n_gaps`` maximal runs of missing buckets (pairs of neighbours
      more than one step apart), ``max_gap_buckets`` the longest run;
    - ``coverage`` = n_present/n_expected (double, one division).

    Everything except ``coverage`` is exact integer arithmetic on
    epoch seconds, so the DuckDB twin hash-matches trivially.

    Scale shape: one lag window + one grouped aggregation on ``key`` —
    no spine is materialized (the report costs O(present rows), not
    O(expected rows), exactly why it should run BEFORE a naive
    spine-join gap-fill of a 99%-sparse source).
    """
    _, step = tier_grain(tier_name)
    w = Window.partitionBy(key).orderBy(ts)
    e = F.unix_timestamp(ts)
    prev = F.lag(e).over(w)
    gap_n = F.when(
        prev.isNotNull(), ((e - prev) / F.lit(step)).cast("long") - 1
    ).otherwise(F.lit(0))
    d = tier.select(key, F.col(ts)).withColumn("_gap_n", gap_n)
    g = d.groupBy(key).agg(
        F.count("*").alias("n_present"),
        (
            (F.max(e) - F.min(e)) / F.lit(step) + 1
        ).cast("long").alias("n_expected"),
        F.min(ts).alias("first_bucket"),
        F.max(ts).alias("last_bucket"),
        F.sum(F.when(F.col("_gap_n") > 0, 1).otherwise(0))
        .cast("long").alias("n_gaps"),
        F.max("_gap_n").alias("max_gap_buckets"),
    )
    return g.select(
        key, "first_bucket", "last_bucket", "n_present", "n_expected",
        (F.col("n_expected") - F.col("n_present")).alias("n_missing"),
        "n_gaps", "max_gap_buckets",
        F.round(
            F.col("n_present").cast("double")
            / F.col("n_expected").cast("double"),
            6,
        ).alias("coverage"),
    )
