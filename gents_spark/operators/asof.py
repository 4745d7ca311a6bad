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
2. per (key, day-chunk) window ordered by (ts, tag): LOCF the right ROW
   — one struct column, so all right fields attach ATOMICALLY (per-
   column carries would stitch values from different right rows whenever
   a right column holds NULLs — round-2 ADVICE);
3. day-summary carry moves the last right row of earlier chunks across
   chunk boundaries (same parallel-prefix decomposition as the gap-fill
   LOCF — one window shuffle, a tiny summary, a broadcast join; a
   year-long hot key is never one straggler task);
4. keep only left rows; unpack the struct.

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
    tolerance_s: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the latest right row with right_ts <= left_ts per key.

    ``direction`` (pandas ``merge_asof`` / QuestDB parity; r05):

    - ``backward`` (default): latest right row at-or-before — LOCF of
      the right ROW over the unioned stream;
    - ``forward``: earliest right row at-or-after — the mirrored carry
      (first following right row; ties included by flipping the
      right-row sort tag to AFTER left rows at equal timestamps);
    - ``nearest``: whichever of the two is closer in time; exact ties
      take the BACKWARD row (matching pandas).  Both carries run in the
      same single union — still ONE shuffle of |L|+|R| rows.

    ``tolerance_s`` bounds staleness in the chosen direction (absolute
    time distance for ``nearest``).  Property-pinned against
    ``pandas.merge_asof`` on random multi-key streams
    (tests/test_tsops.py).

    Left rows with no earlier right row keep nulls.  If the right side
    has several rows at one (key, ts) the one with the largest struct
    value is carried — tier tables are unique per (key, bucket), so this
    does not arise there.  Raises on column-name collisions between the
    left table and the carried right columns (silently overwriting the
    left's own column was round-2 ADVICE #3).

    ``tolerance_s``: maximum staleness (pandas ``merge_asof``
    ``tolerance`` / QuestDB ASOF TOLERANCE analog) — a matched right
    row older than ``left_ts - tolerance_s`` is discarded and the left
    row keeps NULL right columns.  The bound is enforced on the carried
    row's own timestamp (shipped inside the struct), so it composes
    with the cross-chunk carry for free.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    clash = sorted(set(left.columns) & set(right_cols))
    if clash:
        raise ValueError(
            f"asof_join: right columns {clash} already exist on the left "
            "table; rename or pass right_cols explicitly"
        )
    # the carried row always ships its own timestamp (_rts) so the
    # tolerance bound can be checked after LOCF/carry resolution
    row_struct = F.struct(
        *[F.col(c) for c in right_cols],
        F.col(right_ts).cast("timestamp").alias("_rts"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_l"),
        row_struct.alias("_rrow"),
    )
    l_tag = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_is_l", F.lit(1)
    )
    l_tag = l_tag.withColumn(
        "_rrow", F.lit(None).cast(r_tag.schema["_rrow"].dataType)
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction={direction!r}: expected backward|forward|nearest"
        )
    u = l_tag.unionByName(r_tag.select(*l_tag.columns)).withColumn(
        "_gchunk", F.date_trunc("day", F.col("_t"))
    )

    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    chunks = u.select(key, "_gchunk").distinct()
    rrows = u.filter(F.col("_is_l") == 0)
    filled = u
    drop = ["_t", "_is_l", "_gchunk", "_rrow"]
    tol_us = (
        int(tolerance_s * 1_000_000) if tolerance_s is not None else None
    )
    lt_us = F.unix_micros(F.col("_t").cast("timestamp"))

    # within-chunk: carry the whole latest right ROW (struct LOCF — a
    # right row with NULL fields still overwrites older rows), plus the
    # mirrored first-following carry for the forward direction.  Right
    # rows sort BEFORE left at equal _t, so the backward frame includes
    # ties; the forward pick recovers equal-ts ties from the backward
    # carry below (distance 0) instead of re-sorting.
    if need_b:
        w = (
            Window.partitionBy(key, "_gchunk")
            .orderBy("_t", "_is_l")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = filled.withColumn(
            "_rb", F.last(F.col("_rrow"), ignorenulls=True).over(w)
        )
        rsum = rrows.groupBy(key, "_gchunk").agg(
            F.max_by("_rrow", "_t").alias("_last_row")
        )
        w_prev = (
            Window.partitionBy(key)
            .orderBy("_gchunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry_b = chunks.join(rsum, [key, "_gchunk"], "left").select(
            key,
            "_gchunk",
            F.last("_last_row", ignorenulls=True).over(w_prev)
            .alias("_cb_row"),
        )
        filled = filled.join(F.broadcast(carry_b), [key, "_gchunk"], "left")
        drop += ["_rb", "_cb_row"]
    if need_f:
        wf = (
            Window.partitionBy(key, "_gchunk")
            .orderBy("_t", "_is_l")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        filled = filled.withColumn(
            "_rf", F.first(F.col("_rrow"), ignorenulls=True).over(wf)
        )
        rsum_f = rrows.groupBy(key, "_gchunk").agg(
            F.min_by("_rrow", "_t").alias("_first_row")
        )
        w_next = (
            Window.partitionBy(key)
            .orderBy("_gchunk")
            .rowsBetween(1, Window.unboundedFollowing)
        )
        carry_f = chunks.join(rsum_f, [key, "_gchunk"], "left").select(
            key,
            "_gchunk",
            F.first("_first_row", ignorenulls=True).over(w_next)
            .alias("_cf_row"),
        )
        filled = filled.join(F.broadcast(carry_f), [key, "_gchunk"], "left")
        drop += ["_rf", "_cf_row"]

    out = filled
    if need_b:
        best_b = F.coalesce(F.col("_rb"), F.col("_cb_row"))
        if tol_us is not None:
            best_b = F.when(
                lt_us - F.unix_micros(best_b["_rts"]) <= tol_us, best_b
            )
    if need_f:
        best_f_raw = F.coalesce(F.col("_rf"), F.col("_cf_row"))
        # the forward frame starts AT the left row, which sorts after
        # equal-ts right rows — recover the exact-tie (distance 0)
        # match from the backward carry when available
        if need_b:
            tie = F.coalesce(F.col("_rb"), F.col("_cb_row"))
            best_f_raw = F.when(
                F.unix_micros(tie["_rts"]) == lt_us, tie
            ).otherwise(best_f_raw)
        else:
            wtie = (
                Window.partitionBy(key, "_gchunk")
                .orderBy("_t", "_is_l")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            tie = F.last(F.col("_rrow"), ignorenulls=True).over(wtie)
            best_f_raw = F.when(
                F.unix_micros(tie["_rts"]) == lt_us, tie
            ).otherwise(best_f_raw)
        best_f = best_f_raw
        if tol_us is not None:
            best_f = F.when(
                F.unix_micros(best_f["_rts"]) - lt_us <= tol_us, best_f
            )

    if direction == "backward":
        best = best_b
    elif direction == "forward":
        best = best_f
    else:
        db = lt_us - F.unix_micros(best_b["_rts"])
        df = F.unix_micros(best_f["_rts"]) - lt_us
        best = (
            F.when(best_b.isNull(), best_f)
            .when(best_f.isNull(), best_b)
            .when(db <= df, best_b)  # exact tie -> backward (pandas)
            .otherwise(best_f)
        )
    for c in right_cols:
        out = out.withColumn(c, best[c])
    return out.filter(F.col("_is_l") == 1).drop(*drop)
