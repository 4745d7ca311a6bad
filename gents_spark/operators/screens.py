"""Composed per-series health report: every alarm family over one
tier series, in one table.

``curate_corpus`` is the text pipeline's composed verdict (quality AND
dedup AND sampling in one decision table); ``screen_report`` is its
timeseries twin — the on-call view "what is wrong with this feed right
now", unioning the three structural alarm families that share one
hourly input:

- **flatline**: maximal runs of identical consecutive values
  (``anomaly.flatline_runs`` — wedged collector),
- **gap**: maximal runs of MISSING grid buckets (the per-gap rows
  behind ``gapfill.gap_report``'s per-key census — feed stopped),
- **level_shift**: buckets where the forward/backward frame-mean
  contrast exceeds a threshold (``anomaly.level_shift`` — deploy /
  config flip).

One unified alarm schema: ``(key, alarm_type, t_start, t_end,
n_buckets, v, score)`` — ``v`` is the stuck value for flatlines (NULL
otherwise), ``score`` the signed shift for level shifts (NULL
otherwise).  Exactness: flatline and gap rows are all-integer; the
level-shift score is ``level_shift``'s already-hash-green rounded
double, and the threshold compares the ROUNDED value so engine and
oracle filter identical row sets.

Scale shape: three window pipelines over the SAME (key-partitioned)
aggregated tier series, then a unionByName — each branch is the ONE
shuffle-on-key plan of its parent operator, and Spark unions are
metadata-only (no exchange).  Callers should persist the input tier
DataFrame when it is derived from a raw scan: three consumers of an
unpersisted aggregation re-scan the raw table three times (measured —
see driver_queries.q_source_correlation's note).

Reference parity: GenTS's integrity checking is structural-only
(``gents/timeseries.py:26-46`` chunk audit); this unifies the
value-level screens it lacks under one report.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gents_spark.operators.anomaly import flatline_runs, level_shift


def screen_report(
    tier: DataFrame,
    key: str = "source",
    ts: str = "bucket_start",
    value: str = "s",
    step_s: int = 3600,
    origin_s: int = 0,
    min_run: int = 3,
    shift_window: int = 12,
    shift_threshold: float = 2.0,
    scale_div: float = 1.0,
) -> DataFrame:
    """Union the flatline / gap / level-shift alarms over one tier
    series.  ``shift_threshold`` is compared against the ABSOLUTE
    rounded shift (same 6-dp rounding as ``level_shift``); gaps and
    flatlines are parameterized by the grid ``step_s`` and ``min_run``.

    ``origin_s`` MUST match the tier's bucket alignment (0 for
    date_trunc/epoch-aligned tiers; the anchor's epoch offset for
    ``time_bucket(origin=...)`` tiers): flatline and gap alarm times
    are reconstructed as ``index*step + origin``, so a mismatched
    origin would snap them off-grid while level-shift alarms (which
    carry the raw bucket timestamp) stay on it — the report would
    disagree with itself.  Round-tripping is exact when the input is
    grid-aligned (``grid_index`` floors, never truncates).
    """
    if step_s < 1:
        raise ValueError(f"step_s={step_s}: expected >= 1")
    if shift_threshold <= 0:
        raise ValueError(
            f"shift_threshold={shift_threshold}: expected > 0"
        )
    from gents_spark.operators.rollup import grid_index

    d = tier.select(
        F.col(key).alias("key"),
        F.col(ts).alias("ts"),
        F.col(value).cast("long").alias("v"),
    ).withColumn("t", grid_index("ts", step_s, origin_s))

    def _ts(col: F.Column) -> F.Column:
        return F.timestamp_seconds(
            col * F.lit(step_s) + F.lit(int(origin_s))
        )

    flat = flatline_runs(
        d, key="key", order_idx="t", value="v", min_run=min_run
    ).select(
        "key",
        F.lit("flatline").alias("alarm_type"),
        _ts(F.col("t_start")).alias("t_start"),
        _ts(F.col("t_end")).alias("t_end"),
        "n_buckets",
        "v",
        F.lit(None).cast("double").alias("score"),
    )

    w = Window.partitionBy("key").orderBy("t")
    prev_t = F.lag("t").over(w)
    gaps = (
        d.withColumn("_gap_n", F.col("t") - prev_t - 1)
        .filter(F.col("_gap_n") > 0)
        .select(
            "key",
            F.lit("gap").alias("alarm_type"),
            _ts(F.col("t") - F.col("_gap_n")).alias("t_start"),
            _ts(F.col("t") - 1).alias("t_end"),
            F.col("_gap_n").alias("n_buckets"),
            F.lit(None).cast("long").alias("v"),
            F.lit(None).cast("double").alias("score"),
        )
    )

    shifts = (
        level_shift(
            d,
            key="key",
            order="ts",
            value="v",
            window=shift_window,
            scale_div=scale_div,
        )
        .filter(F.abs(F.col("shift")) >= F.lit(float(shift_threshold)))
        .select(
            "key",
            F.lit("level_shift").alias("alarm_type"),
            F.col("ts").alias("t_start"),
            F.col("ts").alias("t_end"),
            F.lit(2 * shift_window).cast("long").alias("n_buckets"),
            F.lit(None).cast("long").alias("v"),
            F.col("shift").alias("score"),
        )
    )

    return flat.unionByName(gaps).unionByName(shifts)
