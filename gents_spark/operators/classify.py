"""Data-driven column classification (SURVEY.md §2.2 F6).

GenTS classifies each variable of a dataset by inspecting its dims
(``gents/meta.py:14-67``): time-dependent variables become time-series
outputs, time-independent ones ride along as static/metadata.  The
tabular analog inspects the DATA, not a config: for every column,
measure overall cardinality and the maximum per-group cardinality, then
classify:

- ``time``        — the event-time column itself
- ``group_key``   — the grouping column itself
- ``identifier``  — distinct values ~ row count (a key, not a measure)
- ``time_varying``— takes >1 value inside at least one group: a
  time-series measure, a rollup candidate
- ``static``      — exactly one value per group: a group attribute

Plan shape: two aggregations over the table (one global countDistinct
batch, one per-group countDistinct batch + max) — both map-side
combined, no melt/explode blow-up.  The result is driver-scale metadata
(one row per column).  At 100 TB run it sampled + approximate
(``sample_frac`` / ``approximate`` below); the rule set is identical —
the class decision needs only coarse cardinalities (a key has ~n
distincts, a static column has 1 per group), which survive both
sampling and HLL error.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: identifier rule: distinct/rows above this is a key, not a measure
ID_FRAC = 0.95


def classify_columns(
    df: DataFrame,
    ts_col: str = "event_time",
    group_col: str = "source",
    sample_frac: float | None = None,
    approximate: bool = False,
) -> DataFrame:
    """(column, n_distinct, max_group_distinct, class) per input column.

    ``sample_frac``: classify over a deterministic (seeded) row sample —
    the 100 TB mode; exact ``countDistinct`` over free-text columns of
    the full table is a giant distinct shuffle the class decision never
    needed.  ``approximate``: use ``approx_count_distinct`` (HLL++,
    bounded state, map-side merge) instead of exact distincts.  The exact
    full-table mode (both defaults) remains the correctness gate's path.
    """
    spark = df.sparkSession
    cols = [c for c in df.columns]
    if sample_frac is not None:
        df = df.sample(fraction=sample_frac, seed=42)
    cd = F.approx_count_distinct if approximate else F.countDistinct
    g = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[cd(c).alias(f"nd_{c}") for c in cols],
    ).collect()[0]
    per = (
        df.groupBy(group_col)
        .agg(*[cd(c).alias(f"d_{c}") for c in cols])
        .agg(*[F.max(f"d_{c}").alias(f"mx_{c}") for c in cols])
        .collect()[0]
    )
    n_rows = g["_n"]
    rows = []
    for c in cols:
        nd, mx = g[f"nd_{c}"], per[f"mx_{c}"]
        if c == ts_col:
            klass = "time"
        elif c == group_col:
            klass = "group_key"
        elif nd >= ID_FRAC * n_rows:
            klass = "identifier"
        elif mx > 1:
            klass = "time_varying"
        else:
            klass = "static"
        rows.append((c, int(nd), int(mx), klass))
    return spark.createDataFrame(
        rows,
        "column string, n_distinct long, max_group_distinct long, "
        "class string",
    )


def rollup_candidates(classes: DataFrame) -> list[str]:
    """Columns a tier build should aggregate: the time-varying measures."""
    return sorted(
        r["column"]
        for r in classes.filter(F.col("class") == "time_varying").collect()
    )
