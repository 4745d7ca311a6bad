"""Time-weighted averages and reset-aware counter aggregation.

Two continuous-aggregate staples of timeseries engines (TimescaleDB's
``time_weight``/``counter_agg`` are the public reference semantics; the
GenTS analog is its per-window reduction planning,
``gents/timeseries.py:411-527``) expressed as single-window + groupBy
plans:

- ``time_weighted_avg``: LOCF-weighted mean — each observation holds
  until the next one; per (key, bucket) TWA =
  sum(v_i * (t_{i+1} - t_i)) / (t_last - t_first), intervals clipped to
  the bucket (the last observation of a bucket carries no weight, so
  buckets with one observation yield NULL, not a divide-by-zero).
- ``counter_agg``: monotonic-counter delta with reset detection — a
  drop in value is a counter restart, contributing the new value itself
  (counter restarted from ~0); reports total true increase + resets.

Both: one lead/lag window per (key, bucket) — the window key EQUALS the
aggregation key, so Spark runs window + partial agg in the same
exchange; no second shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from gents_spark.operators.rollup import bucket_col, bucket_end_col


def time_weighted_avg(
    df: DataFrame,
    tier: str = "1h",
    key: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """(key, bucket_start, twa, n_points, covered_s) per bucket.

    ``id_col`` breaks ordering ties between equal timestamps — required
    for run-to-run (and engine-to-oracle) determinism.
    """
    b = bucket_col(ts_col, tier).alias("bucket_start")
    t = df.select(
        F.col(key).alias("source"),
        b,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts"),  # exact integer microseconds (NTZ -> UTC ts)
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("double").alias("_v"),
    )
    w = Window.partitionBy("source", "bucket_start").orderBy("_ts", "_id")
    t = t.withColumn("_next", F.lead("_ts").over(w)).withColumn(
        "_w", (F.col("_next") - F.col("_ts")).cast("double")
    )
    return (
        t.groupBy("source", "bucket_start")
        .agg(
            F.round(
                F.sum(F.col("_v") * F.col("_w")) / F.sum("_w"), 6
            ).alias("twa"),
            F.count("*").alias("n_points"),
            F.round(
                F.coalesce(F.sum("_w"), F.lit(0.0)) / 1e6, 6
            ).alias("covered_s"),
        )
        .withColumn(
            "bucket_end",
            bucket_end_col(tier),
        )
        .select(
            "source", "bucket_start", "bucket_end",
            "twa", "n_points", "covered_s",
        )
    )


def counter_agg(
    df: DataFrame,
    tier: str = "1h",
    key: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """(key, bucket_start, increase, n_resets, first_v, last_v).

    ``increase`` = sum over consecutive pairs inside the bucket of
    (delta if delta >= 0 else new value); the first observation of a
    bucket contributes nothing (no prior point inside the bucket).
    """
    b = bucket_col(ts_col, tier).alias("bucket_start")
    t = df.select(
        F.col(key).alias("source"),
        b,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("double").alias("_v"),
    )
    w = Window.partitionBy("source", "bucket_start").orderBy("_ts", "_id")
    t = t.withColumn("_prev", F.lag("_v").over(w))
    delta = F.col("_v") - F.col("_prev")
    contrib = F.when(F.col("_prev").isNull(), F.lit(0.0)).otherwise(
        F.when(delta >= 0, delta).otherwise(F.col("_v"))
    )
    reset = F.when(
        F.col("_prev").isNotNull() & (delta < 0), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        t.withColumn("_c", contrib)
        .withColumn("_r", reset)
        .groupBy("source", "bucket_start")
        .agg(
            F.round(F.sum("_c"), 6).alias("increase"),
            F.sum("_r").alias("n_resets"),
            F.round(F.min_by("_v", F.struct("_ts", "_id")), 6).alias("first_v"),
            F.round(F.max_by("_v", F.struct("_ts", "_id")), 6).alias("last_v"),
        )
    )
