"""Continuous aggregates + tiered downsampling (the north_rule core).

GenTS's central transform is "group files by stream, window them by time,
emit one planned output per (group, window)" (``gents/hfcollection.py:903-1005``
slice windows; ``gents/timeseries.py:411-527`` order planner).  Here the
same semantics are one declarative aggregation per tier:

    groupBy(source, date_trunc(unit, event_time))
      .agg(count, sum, min, max, exact percentiles)

Scale notes (100 TB design point):

- The groupBy shuffles on (source, bucket) — high cardinality, so the
  shuffle is well-spread; Spark's partial (map-side) aggregation reduces
  each input partition to ~|distinct buckets| rows before the exchange.
- Additive stats (cnt/sum/min/max) for coarser tiers compose from the
  finer tier (``rollup_from_finer``) — that input is already tiny
  (tier-1m rows, not raw rows), so the cascade costs one cheap shuffle
  per tier.  Exact percentiles do NOT compose (p50 of 1h != f(p50 of 1m),
  SURVEY.md §7.3); ``rollup`` recomputes them from the rows it is given,
  and ``cascade`` recomputes each tier's percentiles from raw.  At
  petabyte scale you would carry a t-digest sketch column instead; the
  exact path is kept because the correctness gate demands exact
  tier-point equality.
- Skewed sources are handled upstream by ``operators.skew.salted_rollup``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: tier name -> date_trunc unit
TIER_UNITS: dict[str, str] = {"1m": "minute", "1h": "hour", "1d": "day"}
#: coarser-tier cascade order
TIER_ORDER: list[str] = ["1m", "1h", "1d"]

PCTS = [0.5, 0.95, 0.99]
_PCT_NAMES = ["p50_tok", "p95_tok", "p99_tok"]


def bucket_col(ts_col: str, tier: str) -> F.Column:
    """Tumbling-window bucket start for a tier.

    ``date_trunc`` is equivalent to ``F.window(ts, width).start`` for
    calendar-aligned widths, stays a plain column (no struct), and maps
    1:1 onto the DuckDB oracle's ``date_trunc``.
    """
    return F.date_trunc(TIER_UNITS[tier], F.col(ts_col))


def sorted_percentile(sorted_arr: F.Column, p: float) -> F.Column:
    """Exact linear-interpolation percentile over a pre-sorted array,
    evaluating the same expression Spark's Percentile aggregate does
    (pos = p*(n-1); (hi-pos)*v[lo] + (pos-lo)*v[hi]) — bitwise-identical
    results, but as whole-stage-codegen projections instead of the
    ObjectHashAggregate, which profiles ~10x slower on high-cardinality
    groupings (one small array per bucket)."""
    n = F.size(sorted_arr)
    pos = F.lit(p) * (n - 1).cast("double")
    lo = F.floor(pos).cast("int")
    hi = F.ceil(pos).cast("int")
    vlo = F.element_at(sorted_arr, lo + 1).cast("double")
    vhi = F.element_at(sorted_arr, hi + 1).cast("double")
    return F.when(n == 0, F.lit(None).cast("double")).when(lo == hi, vlo).otherwise(
        (hi.cast("double") - pos) * vlo + (pos - lo.cast("double")) * vhi
    )


def rollup(
    df: DataFrame,
    tier: str,
    source_col: str = "source",
    ts_col: str = "event_time",
    value_col: str = "n_tok",
    with_percentiles: bool = True,
) -> DataFrame:
    """One continuous-aggregate tier from raw rows.

    Output schema (SURVEY.md §1.3 tier model):
    (source, tier, bucket_start, bucket_end, cnt, sum_tok, min_tok,
     max_tok, p50_tok, p95_tok, p99_tok)

    Percentiles are exact (linear interpolation, Spark/Hive formula),
    computed from a per-bucket ``sort_array(collect_list(...))`` — one
    shuffle carrying the bucket's values (the same bytes the Percentile
    aggregate would ship, since percentiles have no partial combine), but
    all downstream math stays in codegen.  Bucket size is time-bounded,
    so per-group arrays cannot blow memory.
    """
    unit = TIER_UNITS[tier]
    v = F.col(value_col)
    aggs = [
        F.count("*").alias("cnt"),
        F.sum(v.cast("long")).alias("sum_tok"),
        F.min(v).alias("min_tok"),
        F.max(v).alias("max_tok"),
    ]
    if with_percentiles:
        aggs.append(F.sort_array(F.collect_list(v.cast("double"))).alias("_sv"))
    out = (
        df.groupBy(
            F.col(source_col).alias("source"),
            bucket_col(ts_col, tier).alias("bucket_start"),
        )
        .agg(*aggs)
        .withColumn("tier", F.lit(tier))
        .withColumn(
            "bucket_end", F.timestamp_add(unit.upper(), F.lit(1), F.col("bucket_start"))
        )
    )
    if with_percentiles:
        for p, name in zip(PCTS, _PCT_NAMES):
            out = out.withColumn(name, sorted_percentile(F.col("_sv"), p))
        out = out.drop("_sv")
    cols = ["source", "tier", "bucket_start", "bucket_end", "cnt", "sum_tok",
            "min_tok", "max_tok"]
    if with_percentiles:
        cols += _PCT_NAMES
    return out.select(*cols)


def rollup_from_finer(finer: DataFrame, tier: str) -> DataFrame:
    """Compose additive stats of a coarser tier from a finer tier.

    cnt/sum/min/max are associative so this never touches raw data —
    the GenTS analog is re-slicing already-planned windows.  Percentiles
    are intentionally absent (non-composable); use ``rollup`` on raw (or
    ``cascade``) when exact percentiles are required at every tier.
    """
    unit = TIER_UNITS[tier]
    return (
        finer.groupBy(
            "source", bucket_col("bucket_start", tier).alias("bucket_start")
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_tok").alias("sum_tok"),
            F.min("min_tok").alias("min_tok"),
            F.max("max_tok").alias("max_tok"),
        )
        .withColumn("tier", F.lit(tier))
        .withColumn(
            "bucket_end", F.timestamp_add(unit.upper(), F.lit(1), F.col("bucket_start"))
        )
        .select(
            "source", "tier", "bucket_start", "bucket_end",
            "cnt", "sum_tok", "min_tok", "max_tok",
        )
    )


def cascade(
    df: DataFrame,
    tiers: list[str] | None = None,
    source_col: str = "source",
    ts_col: str = "event_time",
    value_col: str = "n_tok",
) -> dict[str, DataFrame]:
    """All tiers, each with exact percentiles recomputed from raw.

    Returns {tier: DataFrame}.  The raw input is scanned once per tier;
    callers doing all tiers in one job should ``df.persist()`` the
    projected raw columns first (bench.py does).
    """
    tiers = tiers or TIER_ORDER
    return {
        t: rollup(df, t, source_col=source_col, ts_col=ts_col, value_col=value_col)
        for t in tiers
    }
