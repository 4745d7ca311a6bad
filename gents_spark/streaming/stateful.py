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
