"""Sequence packing: assign documents to fixed-token-budget windows.

Pretraining batches are built by CONCATENATING documents into a single
token stream and CHOPPING it into fixed-size windows ("concat-and-chop",
the packing used by GPT-style pipelines).  The distributed form: within
each (key, chunk) group, order sequences deterministically, take the
exclusive running token sum, and derive each sequence's window id and
offset arithmetically —

    pack_id        = floor(cum_before / budget)
    offset_in_pack = cum_before % budget

A sequence whose tokens straddle a window boundary is attributed to the
window holding its FIRST token (its tail spills into the next window),
exactly like the flat token stream.

Scale shape: one window aggregation per (key, chunk) partition — the
same per-key parallel-prefix family as gap-fill/sessionize; no global
total order is ever materialized (a global single-stream pack would
serialize the cumsum; per-(source, chunk) packs are what a sharded
trainer consumes anyway).  Everything is exact integer arithmetic in
whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pack_tokens(
    df: DataFrame,
    budget: int,
    key: str = "source",
    order: str = "doc_id",
    weight: str = "n_tok",
) -> DataFrame:
    """Add ``cum_before``, ``pack_id``, ``offset_in_pack`` per row.

    ``budget``: window size in tokens (or any additive weight unit);
    ``order`` must be unique within ``key`` for a deterministic stream.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(F.col(weight)).over(w), F.lit(0)).cast("long")
    return (
        df.withColumn("cum_before", cum)
        .withColumn(
            "pack_id", F.floor(F.col("cum_before") / F.lit(budget))
        )
        .withColumn(
            "offset_in_pack", F.col("cum_before") % F.lit(budget)
        )
    )


def pack_stats(packed: DataFrame, key: str = "source") -> DataFrame:
    """Per-(key, pack) fill statistics: sequence count and token sum.

    The usual packing-efficiency audit — the LAST pack of each key is
    the only one allowed to be under-full in concat-and-chop.
    """
    return packed.groupBy(key, "pack_id").agg(
        F.count("*").alias("n_seqs"),
        F.sum("n_tok").alias("sum_tok"),
        F.min("offset_in_pack").alias("first_offset"),
    )
