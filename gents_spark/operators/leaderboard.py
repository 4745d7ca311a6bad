"""Per-bucket leaderboards and their time evolution.

GenTS's statistics are per-collection totals (``gents/utils.py:
124-206``); an operations view of a tiered timeseries needs the
CROSS-key comparison per bucket — who are the heaviest sources this
hour, and who moved: a source that jumps from rank #40 to #3 in one
bucket is a routing change or a runaway producer long before any
per-source screen (``anomaly.rolling_zscore``/``cusum_drift``) trips.

All arithmetic is integer (counts, ranks, rank deltas) — trivially
hash-stable across engines; the only care point is the rank tiebreak
(value DESC, key ASC — a total order, so ranks are deterministic under
any input partitioning).

Scale shape: one window partitioned BY BUCKET for the rank (each
bucket's leaderboard is one task — |keys| rows per bucket, the tiny
dimension), then one window partitioned BY KEY for the shift (lag to
the key's previous appearance).  Two shuffles of aggregated rows, no
join, no UDF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def rank_shift(
    series: DataFrame,
    key: str = "source",
    ts: str = "bucket_start",
    value: str = "cnt",
    top_k: int | None = None,
) -> DataFrame:
    """Per bucket, rank keys by ``value`` (DESC, key ASC tiebreak) and
    report each key's movement since its PREVIOUS appearance: ``shift =
    prev_rank - rank`` (positive = climbed).  First appearance has NULL
    prev_rank/shift.

    ``prev_rank`` deliberately refers to the key's previous PRESENT
    bucket, not the previous grid bucket — a key absent for a day and
    returning at rank #3 shows the full story (absence is ``gap_report``
    territory, not the leaderboard's).

    ``top_k`` filters AFTER the shift computation, so a mover entering
    the top-k still shows the rank it came from.
    """
    wrank = Window.partitionBy(ts).orderBy(F.desc(value), F.asc(key))
    wkey = Window.partitionBy(key).orderBy(ts)
    d = (
        series.withColumn("rank", F.rank().over(wrank).cast("long"))
        .withColumn("prev_rank", F.lag("rank").over(wkey))
        .withColumn("prev_value", F.lag(value).over(wkey))
        .withColumn("shift", F.col("prev_rank") - F.col("rank"))
    )
    if top_k is not None:
        d = d.filter(F.col("rank") <= top_k)
    return d
