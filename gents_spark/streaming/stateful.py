"""Custom stateful streaming operator: per-source running ingest totals.

The ``applyInPandasWithState`` surface (SURVEY.md §2.9) — arbitrary
per-key state maintained across micro-batches.  Semantics: a live
version of GenTS's collection statistics (``gents/utils.py:124-206``),
continuously tracking per-source row/token totals and the high-water
sequence mark as data streams in; downstream consumers use the
high-water mark to decide when a bucket is safely complete.

State is a single row per source: (cnt, sum_tok, max_seq).  Arrow
batches in, vectorized pandas math, one emitted row per (source, batch)
— no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("cnt", LongType()),
        StructField("sum_tok", LongType()),
        StructField("max_seq", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("sum_tok", LongType()),
        StructField("max_seq", LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cnt, sum_tok, max_seq = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        cnt += len(pdf)
        sum_tok += int(pdf["n_tok"].sum())
        if len(pdf):
            max_seq = max(max_seq, int(pdf["seq"].max()))
    state.update((cnt, sum_tok, max_seq))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "cnt": [cnt],
            "sum_tok": [sum_tok],
            "max_seq": [max_seq],
        }
    )


def running_source_totals(stream: DataFrame) -> DataFrame:
    """stream: (source, seq, n_tok) -> one updated totals row per source
    per micro-batch, with state carried across batches/restarts."""
    return stream.groupBy("source").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def _ewma_update_fn(alpha: float):
    a, b = float(alpha), 1.0 - float(alpha)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, acc = state.get if state.exists else (0, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            vals = pdf.sort_values("seq")["v"].to_numpy(dtype="float64")
            i = 0
            if acc is None:
                acc, n, i = float(vals[0]), 1, 1
            # EWMA is inherently sequential (each step consumes the
            # previous accumulator), so this is a per-value loop INSIDE
            # the Arrow batch — same double ops, same left-to-right
            # order as the batch fold, hence bit-equal to ewma_smooth
            for x in vals[i:]:
                acc = float(x) * a + acc * b
            n += len(vals) - i
        state.update((n, acc))
        yield pd.DataFrame({"source": [key[0]], "n": [n], "ewma": [acc]})

    return update


def streaming_ewma(stream: DataFrame, alpha: float = 0.25) -> DataFrame:
    """stream: (source, seq, v) -> one updated (source, n, ewma) row per
    source per micro-batch; the fold ``acc = v*alpha + acc*(1-alpha)``
    (seeded with the key's FIRST value, rows ordered by ``seq``) carries
    across batches and restarts via GroupState.

    The streaming twin of ``operators/anomaly.ewma_smooth`` with an
    unbounded frame: because the fold's state is just (n, acc), the
    micro-batch boundary placement cannot change the result —
    stream==batch is pinned exactly (bit-equal doubles) by
    tests/test_stateful_stream.py.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha={alpha}: expected (0, 1]")
    return stream.groupBy("source").applyInPandasWithState(
        _ewma_update_fn(alpha),
        EWMA_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


GAP_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("status", StringType()),
        StructField("last_seen_us", LongType()),
        StructField("gap_s", LongType()),
        StructField("n_events", LongType()),
    ]
)

GAP_STATE_SCHEMA = StructType(
    [
        StructField("last_seen_us", LongType()),
        StructField("n_events", LongType()),
        StructField("stale", LongType()),
    ]
)


def _gap_update_fn(liveness_s: int):
    liveness_us = int(liveness_s) * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_seen + liveness with no new data:
            # the feed is STALE.  Emit once; do not re-arm (a second
            # alarm for the same silence is noise — recovery re-arms).
            last_us, n, _ = state.get
            wm_us = state.getCurrentWatermarkMs() * 1000
            state.update((last_us, n, 1))
            yield pd.DataFrame(
                {
                    "source": [key[0]],
                    "status": ["stale"],
                    "last_seen_us": [last_us],
                    "gap_s": [(wm_us - last_us) // 1_000_000],
                    "n_events": [n],
                }
            )
            return
        last_us, n, stale = state.get if state.exists else (None, 0, 0)
        batch_max_us = None
        batch_min_us = None
        cnt = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            cnt += len(pdf)
            arr = pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            mx, mn = int(arr.max()) // 1000, int(arr.min()) // 1000
            batch_max_us = mx if batch_max_us is None else max(batch_max_us, mx)
            batch_min_us = mn if batch_min_us is None else min(batch_min_us, mn)
        rows = []
        if batch_max_us is not None:
            # the FIRST resumed event ends the silence, so the closed
            # gap is measured to the batch min, not the batch max
            gap_us = (
                batch_min_us - last_us if last_us is not None else 0
            )
            if last_us is not None and gap_us > liveness_us:
                # data resumed after a silence longer than liveness —
                # report the gap that just closed (pairs with the
                # earlier 'stale' alarm if the watermark saw it)
                rows.append(("recovered", batch_max_us, gap_us // 1_000_000))
            new_last = max(last_us or 0, batch_max_us)
            n += cnt
            state.update((new_last, n, 0))
            # re-arm: fire when the watermark passes the deadline.  A
            # deadline already behind the watermark would be rejected,
            # so clamp 1ms past it (fires at the next micro-batch).
            deadline_ms = new_last // 1000 + int(liveness_s) * 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
            # late (pre-watermark) stragglers can make gap negative;
            # the live row's cadence delta clamps at 0
            rows.append(("live", new_last, max(gap_us, 0) // 1_000_000))
        if rows:
            yield pd.DataFrame(
                {
                    "source": [key[0]] * len(rows),
                    "status": [r[0] for r in rows],
                    "last_seen_us": [r[1] for r in rows],
                    "gap_s": [r[2] for r in rows],
                    "n_events": [n] * len(rows),
                }
            )

    return update


def streaming_gap_detect(
    stream: DataFrame,
    liveness_s: int = 7200,
    watermark: str = "30 minutes",
) -> DataFrame:
    """stream: (source, ts) -> liveness monitor rows per source — the
    STREAMING twin of ``operators/gapfill.gap_report``: a batch census
    reports gaps after the fact; this fires while the gap is open.

    Per source the state is (last_seen, n_events, stale).  Every batch
    with data emits a ``live`` row and re-arms an EVENT-TIME timeout at
    ``last_seen + liveness_s``; if the watermark passes the deadline
    with no new data the state times out and emits ONE ``stale`` alarm
    (gap_s = watermark - last_seen, a lower bound on the real gap).
    When data later resumes after a silence > liveness_s, a
    ``recovered`` row reports the exact gap that closed — so alarm and
    closure pair up even if the stale alarm was missed (watermark
    stalled).  Event-time timeout (not processing-time) keeps the
    semantics replay-deterministic: re-running the same files through
    the checkpoint yields the same alarms, which is what the restart
    test pins.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("source")
        .applyInPandasWithState(
            _gap_update_fn(liveness_s),
            GAP_OUTPUT_SCHEMA,
            GAP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("term", StringType()),
        StructField("est", LongType()),
        StructField("max_err", LongType()),
        StructField("n_seen", LongType()),
    ]
)

HH_STATE_SCHEMA = StructType(
    [
        StructField("terms", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)


def _hh_update_fn(k: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            terms, counts, n_seen = state.get
            s = pd.Series(
                [int(c) for c in counts], index=list(terms), dtype="int64"
            )
        else:
            s, n_seen = pd.Series(dtype="int64"), 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            vc = pdf["term"].value_counts()  # vectorized exact batch counts
            n_seen += int(vc.sum())
            s = s.add(vc.astype("int64"), fill_value=0).astype("int64")
            if len(s) > k:
                # mergeable-summaries reduction (Agarwal et al. 2012,
                # Mergeable Summaries §3): subtract the (k+1)-th largest
                # count from everything, keep the strictly positive — at
                # most k survive (ties at the cut drop to zero)
                cut = int(s.nlargest(k + 1).iloc[-1])
                s = s - cut
                s = s[s > 0]
        s = s.sort_index()  # deterministic state + emit order
        state.update(
            ([str(t) for t in s.index], [int(c) for c in s], n_seen)
        )
        # any term's undercount <= (n_seen - sum of kept counters)/(k+1)
        err = int((n_seen - int(s.sum())) // (k + 1))
        yield pd.DataFrame(
            {
                "source": key[0],
                "term": s.index,
                "est": s.to_numpy(dtype="int64"),
                "max_err": err,
                "n_seen": n_seen,
            }
        )

    return update


def streaming_heavy_hitters(stream: DataFrame, k: int = 16) -> DataFrame:
    """stream: (source, term) -> the per-source Misra-Gries heavy-hitter
    summary after each micro-batch: at most ``k`` (term, est) counters
    plus the shared error bound ``max_err``.

    Guarantees (the classic MG deterministic bounds, which the restart
    test pins): ``est <= true_count <= est + max_err``, and every term
    with ``true_count > n_seen/(k+1)`` is PRESENT in the summary — so
    thresholding at ``est + max_err >= phi*n_seen`` never misses a
    phi-heavy hitter.  State is bounded at k counters per source
    regardless of vocabulary size — the streaming complement of the
    batch ``vocab.topk_terms_per_bucket`` (exact, but needs the whole
    bucket): at 10^12-token scale the live dashboard runs this, the
    nightly batch job reconciles with the exact ranks.

    Batch math is vectorized (value_counts + aligned Series add); the
    only Python iteration is over the <= k surviving counters.  Merging
    by count-add then (k+1)-th-largest subtraction makes summaries
    MERGEABLE, so micro-batch boundaries (and restarts from the
    checkpoint) never break the bounds.
    """
    if k < 1:
        raise ValueError(f"k={k}: expected >= 1")
    return stream.groupBy("source").applyInPandasWithState(
        _hh_update_fn(k),
        HH_OUTPUT_SCHEMA,
        HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FLATLINE_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("t_start", LongType()),
        StructField("t_end", LongType()),
        StructField("n_buckets", LongType()),
        StructField("v", LongType()),
    ]
)

FLATLINE_STATE_SCHEMA = StructType(
    [
        StructField("run_start", LongType()),
        StructField("run_v", LongType()),
        StructField("next_t", LongType()),
        StructField("run_len", LongType()),
    ]
)


def _flatline_update_fn(min_run: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        ts, vs = [], []
        for pdf in pdfs:
            # a NULL t or v (contract violation) must not poison-pill
            # the query: Arrow hands NaN in a float column and the
            # int64 cast raises, failing every replay of this batch.
            # DROPPING the row reproduces the batch twin's break rule —
            # the missing bucket becomes a grid gap, which breaks the
            # run on both sides exactly like flatline_runs' NULL break.
            pdf = pdf.dropna(subset=["t", "v"])
            if len(pdf):
                ts.append(pdf["t"].to_numpy(dtype="int64"))
                vs.append(pdf["v"].to_numpy(dtype="int64"))
        if not ts:
            return
        t = np.concatenate(ts)
        v = np.concatenate(vs)
        order = np.argsort(t, kind="stable")
        t, v = t[order], v[order]
        # islands WITHIN the batch: vectorized break detection (grid
        # gap or value change), then a loop over islands only — the
        # same no-per-row discipline as the MG counters above
        brk = np.flatnonzero((np.diff(t) != 1) | (np.diff(v) != 0))
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [len(t) - 1]))
        open_run = state.get if state.exists else None
        closed: list[tuple[int, int, int, int]] = []
        for s, e in zip(starts, ends):
            i_start, i_end = int(t[s]), int(t[e])
            i_len, i_v = int(e - s + 1), int(v[s])
            if open_run is not None:
                rs, rv, nt, rl = open_run
                if i_start == nt and i_v == rv:
                    # the island extends the carried run
                    open_run = (rs, rv, i_end + 1, rl + i_len)
                    continue
                # carried run closes at the island boundary
                closed.append((rs, nt - 1, rl, rv))
            open_run = (i_start, i_v, i_end + 1, i_len)
        # the loop leaves exactly the last island (possibly merged with
        # the carried run) open; everything in `closed` is final
        emit = [r for r in closed if r[2] >= min_run]
        state.update(tuple(int(x) for x in open_run))
        if emit:
            yield pd.DataFrame(
                {
                    "source": [key[0]] * len(emit),
                    "t_start": [r[0] for r in emit],
                    "t_end": [r[1] for r in emit],
                    "n_buckets": [r[2] for r in emit],
                    "v": [r[3] for r in emit],
                }
            )

    return update


def streaming_flatline(stream: DataFrame, min_run: int = 3) -> DataFrame:
    """stream: (source, t, v) bucketed integer metric -> each CLOSED
    run of >= ``min_run`` consecutive identical buckets, as it closes —
    the STREAMING twin of ``operators/anomaly.flatline_runs`` (same
    break rule: value change OR grid gap), emitting the stuck-feed
    alarm the moment the feed unsticks instead of at the nightly batch
    census.

    Contract: one row per (source, t) — the upstream bucketed producer
    (a tier build or windowed count) guarantees it; within a
    micro-batch rows may arrive unordered (sorted internally), but
    buckets must not straddle batches out of order.  A run still OPEN
    never emits (there is no way to know it won't extend); the batch
    census is the reconciliation path for runs open at end-of-data —
    the same live/nightly split as streaming_heavy_hitters.

    State per source is one open run (start, value, next-expected-t,
    length) — O(1) regardless of history.  Restart-deterministic: no
    processing-time dependence at all, so replaying the same files
    through the checkpoint yields identical alarms.
    """
    if min_run < 2:
        raise ValueError(f"min_run={min_run}: expected >= 2")
    return stream.groupBy("source").applyInPandasWithState(
        _flatline_update_fn(min_run),
        FLATLINE_OUTPUT_SCHEMA,
        FLATLINE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
