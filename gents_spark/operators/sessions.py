"""Sessionization, state-duration aggregation, and point-in-interval
(range) joins over event streams.

Reference parity: GenTS slices continuous model history into bounded
time orders (``gents/timeseries.py:392-430`` order planning over
contiguous spans); the event-stream analogs of that span logic are

- gap-based sessionization (a "span" ends when the gap to the next
  observation exceeds a threshold),
- state-duration aggregation (how long each group spent in each state,
  TimescaleDB ``state_agg`` semantics), and
- point-in-interval joins (which observations fall inside which span).

All three are declarative DataFrame ops built for scale:

- sessionize/state durations: ONE shuffle on the session key; windows
  run inside each key partition.  Keys (users, devices, sources) are
  high-cardinality, so partitions stay bounded — the single-giant-key
  case is the same chunked parallel-prefix escape hatch gapfill.py uses.
- interval join: the classic BINNED range join — both sides are mapped
  to fixed-width time bins (an interval explodes into the bins it
  covers, ceil(len/grain)+1 of them), equi-joined on (key, bin), then
  refined with the exact range predicate.  This turns an
  O(|points| x |intervals|) cross product into an equi-join whose
  fan-out is bounded by interval length / grain — the shape Spark's own
  optimizer cannot derive from a raw BETWEEN join.

Timestamp arithmetic is integer microseconds (``unix_micros`` /
DuckDB ``epoch_us``) on both engine and oracle sides — no float
truncation ambiguity at sub-second gaps.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: int = 14400,
) -> DataFrame:
    """Assign a per-key ``session_seq`` (1-based) to every event.

    A new session starts at the first event of a key and whenever the
    gap to the previous event exceeds ``gap_s`` seconds.  Two stacked
    windows (lag -> cumulative sum of session starts) — window functions
    cannot nest, so the boundary flag is materialized first; both run in
    the SAME key partition, so this is one shuffle total.
    """
    w = Window.partitionBy(key).orderBy(ts)
    tsc = F.col(ts).cast("timestamp")  # NTZ-safe (parquet NTZ -> UTC)
    gap_us = F.unix_micros(tsc) - F.unix_micros(F.lag(tsc).over(w))
    flagged = events.withColumn(
        "_new_sess",
        F.when(
            gap_us.isNull() | (gap_us > gap_s * 1_000_000), 1
        ).otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        "session_seq", F.sum("_new_sess").over(cum)
    ).drop("_new_sess")


def sessionize_chunked(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: int = 14400,
    chunk_unit: str = "day",
) -> DataFrame:
    """``sessionize`` for a GIANT single key: parallel-prefix over time
    chunks (the gapfill.py chunk-carry pattern).

    The plain operator sorts one key's whole history in one task; at a
    billion events per key that task is the job.  Here:

    1. rows get a ``chunk`` (date_trunc of ts) — windows run per
       (key, chunk), so one key's history spreads over its chunks;
    2. within each chunk: the local lag flag (first chunk row gets 0 —
       its boundary is unknowable locally) and a local running count of
       session starts;
    3. a per-(key, chunk) summary (first/last ts, local start count)
       is tiny — |keys x chunks| rows; a lag window over summaries
       decides each chunk's BOUNDARY flag (gap to the previous chunk's
       last event, or first chunk), and an exclusive prefix sum gives
       each chunk's session OFFSET;
    4. offsets join back on (key, chunk):
       session_seq = offset + boundary_flag + local_running_count.
       No forced broadcast hint — for the documented giant-single-key
       case the summary is tiny and AQE broadcasts it on its own, but
       a general (many keys x many chunks) input has an unbounded
       summary and a forced hint would hit the 8 GB broadcast limit at
       exactly the scale this operator targets (round-3 ADVICE).

    Exactly equal to ``sessionize`` output (pinned by test), two cheap
    extra shuffles of summary-sized data.
    """
    tsc = F.col(ts).cast("timestamp")
    d = events.withColumn("_sch", F.date_trunc(chunk_unit, tsc))
    wc = Window.partitionBy(key, "_sch").orderBy(ts)
    gap_us = F.unix_micros(tsc) - F.unix_micros(F.lag(tsc).over(wc))
    d = d.withColumn(
        "_lflag",
        F.when(gap_us.isNull(), 0)  # chunk-first row: decided later
        .when(gap_us > gap_s * 1_000_000, 1)
        .otherwise(0),
    ).withColumn(
        "_lcum",
        F.sum("_lflag").over(
            wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    summ = d.groupBy(key, "_sch").agg(
        F.min(tsc).alias("_first_ts"),
        F.max(tsc).alias("_last_ts"),
        F.sum("_lflag").alias("_lstarts"),
    )
    ws = Window.partitionBy(key).orderBy("_sch")
    prev_last = F.lag("_last_ts").over(ws)
    bflag = F.when(
        prev_last.isNull()
        | (
            F.unix_micros(F.col("_first_ts")) - F.unix_micros(prev_last)
            > gap_s * 1_000_000
        ),
        1,
    ).otherwise(0)
    summ = summ.withColumn("_bflag", bflag).withColumn(
        "_offset",
        F.coalesce(
            F.sum(F.col("_bflag") + F.col("_lstarts")).over(
                ws.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    joined = d.join(
        summ.select(key, "_sch", "_bflag", "_offset"),
        [key, "_sch"],
    )
    return joined.withColumn(
        "session_seq",
        (F.col("_offset") + F.col("_bflag") + F.col("_lcum")).cast("bigint"),
    ).drop("_sch", "_lflag", "_lcum", "_bflag", "_offset")


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: int = 14400,
    value: str | None = "value",
) -> DataFrame:
    """Per-session aggregates: start, end, duration, event count (and
    value sum when ``value`` is given).  One shuffle on ``key`` — the
    session groupBy keys on (key, session_seq), a superset of the
    window partitioning, so Catalyst adds no second exchange.
    """
    s = sessionize(events, key=key, ts=ts, gap_s=gap_s)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(
            (F.max(F.unix_micros(F.col(ts).cast("timestamp")))
             - F.min(F.unix_micros(F.col(ts).cast("timestamp")))) / 1e6,
            6,
        ).alias("duration_s"),
    ]
    if value is not None:
        aggs.append(F.round(F.sum(value), 6).alias("sum_val"))
    return s.groupBy(F.col(key), F.col("session_seq")).agg(*aggs)


def state_durations(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    state: str = "event_type",
) -> DataFrame:
    """Total time each key's stream spent in each state (TimescaleDB
    ``state_agg``): an event puts its key INTO ``state`` until the next
    event; the final open interval has no end and is excluded.

    Output: (state, n_intervals, total_s, mean_s).  One shuffle for the
    lead window; the state groupBy re-shuffles |states| partial rows —
    map-side combined, so the second exchange carries almost nothing.
    """
    w = Window.partitionBy(key).orderBy(ts)
    tsc = F.col(ts).cast("timestamp")  # NTZ-safe
    dur_us = F.unix_micros(F.lead(tsc).over(w)) - F.unix_micros(tsc)
    d = events.withColumn("_dur_us", dur_us).filter(
        F.col("_dur_us").isNotNull()
    )
    return d.groupBy(F.col(state).alias("state")).agg(
        F.count("*").alias("n_intervals"),
        F.round(F.sum("_dur_us") / 1e6, 6).alias("total_s"),
        F.round((F.sum("_dur_us") / F.count("*")) / 1e6, 6).alias("mean_s"),
    )


def heartbeat_uptime(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    liveness_s: int = 3600,
) -> DataFrame:
    """TimescaleDB ``heartbeat_agg`` semantics: each event proves its
    key alive for ``liveness_s`` seconds; uptime is the measure of the
    union of those [ts, ts+liveness) intervals.

    Union length without interval merging: sorted per key, each beat
    contributes ``min(gap_to_next, liveness)`` and the last beat
    contributes ``liveness`` — one lead window + one groupBy, both on
    the same key partitioning (one shuffle).

    Output: (key, n_beats, uptime_s, span_s, uptime_frac) where span is
    first beat -> last beat + liveness (the observable window).
    """
    lv_us = liveness_s * 1_000_000
    w = Window.partitionBy(key).orderBy(ts)
    tsc = F.col(ts).cast("timestamp")  # NTZ-safe
    gap_us = F.unix_micros(F.lead(tsc).over(w)) - F.unix_micros(tsc)
    contrib = F.least(F.coalesce(gap_us, F.lit(lv_us)), F.lit(lv_us))
    d = events.withColumn("_up_us", contrib)
    return d.groupBy(F.col(key)).agg(
        F.count("*").alias("n_beats"),
        F.round(F.sum("_up_us") / 1e6, 6).alias("uptime_s"),
        F.round(
            (F.max(F.unix_micros(F.col(ts).cast("timestamp")))
             - F.min(F.unix_micros(F.col(ts).cast("timestamp"))) + lv_us)
            / 1e6,
            6,
        ).alias("span_s"),
        F.round(
            (F.sum("_up_us"))
            / (F.max(F.unix_micros(F.col(ts).cast("timestamp")))
               - F.min(F.unix_micros(F.col(ts).cast("timestamp"))) + lv_us),
            6,
        ).alias("uptime_frac"),
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    grain_s: int = 600,
    how: str = "inner",
) -> DataFrame:
    """Binned range join: points joined to the intervals containing them
    (``start <= ts < end``), equi-keyed on (key, time bin).

    Both sides get integer bin columns at ``grain_s`` resolution; an
    interval explodes into every bin it covers (len/grain + 1 rows —
    choose ``grain_s`` near the typical interval length so the fan-out
    is ~2x), the join runs on (key, bin) — an ordinary shuffled or
    broadcast equi-join Catalyst can optimize — and the exact range
    predicate filters the bin-boundary false positives.  No cross join
    at any size.
    """
    g_us = grain_s * 1_000_000
    p = points.withColumn(
        "_bin",
        F.floor(F.unix_micros(F.col(ts).cast("timestamp")) / g_us),
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(
                    F.unix_micros(F.col(start).cast("timestamp")) / g_us
                ),
                # end is exclusive: a point at exactly `end` never
                # matches, but `end`'s bin must still be covered
                F.floor(
                    F.unix_micros(F.col(end).cast("timestamp")) / g_us
                ),
            )
        ),
    )
    joined = p.join(iv, on=[key, "_bin"], how=how).filter(
        (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("_bin")


def interp_join(
    queries: DataFrame,
    data: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Interpolated as-of join: for each query row, the data series'
    linearly-interpolated value at the query's (arbitrary, off-grid)
    timestamp — TimescaleDB's ``interpolate()`` generalized from grid
    buckets to a join (``asof_join`` answers "the last value before
    t", this answers "the value AT t").  ``gapfill(mode='linear')``
    covers grid timestamps; this covers the rest.

    UNION formulation — ONE shuffle on the key and no join at all:
    query and data rows interleave into a single per-key ordered
    stream, two frame-bounded windows carry the surrounding data
    points to each query row, and the interpolation is one fixed
    double expression over exact integer micros.  On a timestamp tie
    the data row sorts FIRST (isq ascending), so a query AT a data
    point returns that value exactly (ratio 0).  Queries before the
    first or after the last data point return NULL — interpolation,
    never extrapolation.

    Contract: (key, ts) unique within ``data`` (two data rows tying on
    ts would make the neighbor choice order-dependent).  A data row
    with a NULL value is SKIPPED — both neighbor carries ignore it
    together (timestamp and value gate on the same condition, so the
    pair can never desync), and interpolation brackets across it.
    Output: one row per query row — (key, ts, v_prev, v_next,
    v_interp).

    Related: ``operators/asof.py::asof_join`` owns the last/nearest
    VALUE-carry family (whole-row struct carry, tolerance, directions);
    this operator lives with the union-window composites because its
    result is a computed expression over TWO carries, not a carried
    row.
    """
    d = data.select(
        key,
        F.col(ts).alias("_t"),
        F.lit(0).alias("_isq"),
        F.col(value).cast("double").alias("_v"),
    )
    q = queries.select(
        key,
        F.col(ts).alias("_t"),
        F.lit(1).alias("_isq"),
        F.lit(None).cast("double").alias("_v"),
    )
    u = d.unionByName(q)
    order = [F.col("_t").asc(), F.col("_isq").asc()]
    wb = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    tu = F.unix_micros(F.col("_t").cast("timestamp"))
    # BOTH carries gate on the same condition (incl. value non-null):
    # conditioning _pt on isq alone but _pv on ignorenulls would pair
    # one row's timestamp with another row's value
    is_point = (F.col("_isq") == 0) & F.col("_v").isNotNull()
    dat_t = F.when(is_point, tu)
    dat_v = F.when(is_point, F.col("_v"))
    k = (
        u.withColumn("_tu", tu)
        .withColumn("_pt", F.last(dat_t, ignorenulls=True).over(wb))
        .withColumn("_pv", F.last(dat_v, ignorenulls=True).over(wb))
        .withColumn("_nt", F.first(dat_t, ignorenulls=True).over(wf))
        .withColumn("_nv", F.first(dat_v, ignorenulls=True).over(wf))
    )
    ratio = (F.col("_tu") - F.col("_pt")).cast("double") / (
        F.col("_nt") - F.col("_pt")
    ).cast("double")
    interp = (
        F.when(F.col("_pt").isNull(), F.lit(None).cast("double"))
        .when(F.col("_tu") == F.col("_pt"), F.col("_pv"))
        .when(F.col("_nt").isNull(), F.lit(None).cast("double"))
        .otherwise(F.col("_pv") + (F.col("_nv") - F.col("_pv")) * ratio)
    )
    return k.filter(F.col("_isq") == 1).select(
        key,
        F.col("_t").alias(ts),
        F.col("_pv").alias("v_prev"),
        F.col("_nv").alias("v_next"),
        F.round(interp, 6).alias("v_interp"),
    )


def merge_intervals(
    intervals: DataFrame,
    key: str = "user_id",
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Overlapping-interval merge per key (PostgreSQL ``range_agg`` /
    the classic gaps-and-islands reduction): sorted by start, a new
    island begins where the interval's start lies strictly past the
    running max of all previous ends; each island collapses to
    (min start, max end).  Touching intervals (start == previous end)
    merge — intervals are [start, end) so they cover abutting time.

    Output: (key, merged_start, merged_end, n_merged, covered_s).

    Two window passes (prev-max-end, then the cumulative island sum)
    and the final groupBy all share the per-key partitioning, so the
    whole chain costs ONE shuffle; islands are numbered by local order
    within each key, never across keys — no global coordination, scales
    per-key like every other window operator here.
    """
    w = Window.partitionBy(key).orderBy(start, end)
    end_us = F.unix_micros(F.col(end).cast("timestamp"))  # NTZ-safe
    start_us = F.unix_micros(F.col(start).cast("timestamp"))
    prev_max_end = F.max(end_us).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = intervals.withColumn(
        "_new_island",
        F.when(
            prev_max_end.isNull() | (start_us > prev_max_end), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "_island",
        F.sum("_new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return islands.groupBy(key, "_island").agg(
        F.min(start).alias("merged_start"),
        F.max(end).alias("merged_end"),
        F.count("*").alias("n_merged"),
        F.round(
            (F.max(end_us) - F.min(start_us)) / 1e6, 6
        ).alias("covered_s"),
    ).drop("_island")


def transition_counts(
    events: DataFrame,
    key: str = "user_id",
    order: tuple[str, ...] = ("ts", "event_id"),
    state: str = "event_type",
) -> DataFrame:
    """First-order Markov transition census of the per-key event
    stream: for every ordered pair of states (A -> B), how many times a
    key's NEXT event after an A was a B, how many distinct keys made
    that move, and the transition probability among all moves out of A.
    The flow map funnels are slices of — ``funnel_conversion`` asks
    about one path, this censuses all |S|^2 of them (error loops,
    view->purchase shortcuts, signup dead-ends).  (GenTS has no event
    semantics; reference parity is the span-ordering machinery cited in
    the module docstring applied to state labels.)

    Determinism: consecutive-pair extraction orders each key's stream
    by the full ``order`` tuple — callers MUST include a unique
    tie-break column (the default includes ``event_id``) or equal-ts
    neighbors would make lag() nondeterministic.  Counts are exact
    bigints; ``share`` is the one double division (count / per-prev
    total), mirrored expression-for-expression by the oracle twin.

    Scale shape: ONE shuffle on ``key`` for the lag window (partitions
    bounded per key like every session operator here), then a map-side
    partial-agg groupBy to the pair census; the per-prev share window
    runs over the AGGREGATED |S|^2-row table, never the raw stream.
    """
    w = Window.partitionBy(key).orderBy(*order)
    d = (
        events.withColumn("_prev", F.lag(state).over(w))
        .filter(F.col("_prev").isNotNull())
    )
    per = d.groupBy(
        F.col("_prev").alias("prev_state"),
        F.col(state).alias("next_state"),
    ).agg(
        F.count("*").alias("n_transitions"),
        F.countDistinct(key).alias("n_keys"),
    )
    tot = Window.partitionBy("prev_state")
    share = F.round(
        F.col("n_transitions").cast("double")
        / F.sum("n_transitions").over(tot).cast("double"),
        9,
    )
    return per.select(
        "prev_state",
        "next_state",
        "n_transitions",
        "n_keys",
        share.alias("share"),
    )
