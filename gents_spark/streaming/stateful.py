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
