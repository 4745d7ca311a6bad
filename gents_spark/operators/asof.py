"""As-of join: attach the latest right-side row at-or-before each left
timestamp, per key (SURVEY.md §2.3 join family; the prompt's canonical
"operator Spark lacks").

Spark has no ASOF JOIN (DuckDB does; so does pandas.merge_asof).  A
range join (``l.ts >= r.ts``) explodes to O(|L| x |R|) per key before
picking the max — dead at scale.  The standard distributed shape is the
UNION-AND-CARRY trick:

1. tag both inputs and union them into one stream
   (right rows sort BEFORE left rows at equal timestamps, so ties are
   included — "at or before");
2. per (key, day-chunk) window ordered by (ts, tag): LOCF the right
   columns forward into the left rows;
3. day-summary carry moves the last right row of earlier chunks across
   chunk boundaries (same parallel-prefix decomposition as the gap-fill
   LOCF — one window shuffle, a tiny summary, a broadcast join; a
   year-long hot key is never one straggler task);
4. keep only left rows.

Cost: ONE shuffle of |L|+|R| rows on the join key — no range blow-up.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "source",
    left_ts: str = "ts",
    right_ts: str = "bucket_start",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Left rows + the latest right row with right_ts <= left_ts per key.

    Left rows with no earlier right row keep nulls.  If the right side
    has several rows at one (key, ts) the last under (ts, col order) is
    carried — tier tables are unique per (key, bucket), so this does not
    arise there.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_is_l", F.lit(1)
    )
    for c in right_cols:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(
                c, F.lit(None).cast(right.schema[c].dataType)
            )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_l"),
        *[F.col(c) for c in right_cols],
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    u = l_tag.unionByName(r_tag.select(*l_tag.columns)).withColumn(
        "_gchunk", F.date_trunc("day", F.col("_t"))
    )

    w = (
        Window.partitionBy(key, "_gchunk")
        .orderBy("_t", "_is_l")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u
    for c in right_cols:
        filled = filled.withColumn(
            f"_r_{c}",
            F.last(
                F.when(F.col("_is_l") == 0, F.col(c)), ignorenulls=True
            ).over(w),
        )

    # carry the last right row of PRECEDING day-chunks
    rsum = (
        u.filter(F.col("_is_l") == 0)
        .groupBy(key, "_gchunk")
        .agg(
            *[F.max_by(c, "_t").alias(f"_last_{c}") for c in right_cols]
        )
    )
    w_prev = (
        Window.partitionBy(key)
        .orderBy("_gchunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunks = u.select(key, "_gchunk").distinct()
    carry = (
        chunks.join(rsum, [key, "_gchunk"], "left")
        .select(
            key,
            "_gchunk",
            *[
                F.last(f"_last_{c}", ignorenulls=True)
                .over(w_prev)
                .alias(f"_c_{c}")
                for c in right_cols
            ],
        )
    )
    out = filled.join(F.broadcast(carry), [key, "_gchunk"], "left")
    for c in right_cols:
        out = out.withColumn(
            c, F.coalesce(F.col(f"_r_{c}"), F.col(f"_c_{c}"))
        )
    drop = ["_t", "_is_l", "_gchunk"]
    drop += [f"_r_{c}" for c in right_cols] + [f"_c_{c}" for c in right_cols]
    return out.filter(F.col("_is_l") == 1).drop(*drop)
