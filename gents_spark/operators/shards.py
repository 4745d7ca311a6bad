"""Shard reunification: reassemble logical documents from fragment rows.

GenTS's spatial-tile assembly (``gents/mhfdataset.py:266-294``): one
logical timestep arrives as several tile files, re-keyed by a hash of
their non-time extents (``hfcollection.py:420-475``) and stitched by
coordinate position.  Our analog (FIXTURES.md ``fragmented``): a logical
sequence arrives as shard rows ``doc_id = "<source>/<seq>#<shard>"``;
reunification is a groupBy on the shard-stripped key with order-aware
token concatenation — a shuffle on the logical key, no join.

Consistency check = GenTS ``is_time_consistent`` (``mhfdataset.py:111-126``):
every logical doc must have the same shard count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_BASE_RE = r"^(.+?)(?:#\d+)?$"
_SHARD_RE = r"#(\d+)$"


def with_shard_key(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "base_doc_id", F.regexp_extract("doc_id", _BASE_RE, 1)
    ).withColumn(
        "shard",
        F.coalesce(
            F.nullif(F.regexp_extract("doc_id", _SHARD_RE, 1), F.lit("")),
            F.lit("0"),
        ).cast("int"),
    )


def reunify_shards(df: DataFrame) -> DataFrame:
    """Fragment rows -> logical sequences table (same input_hint shape).

    Tokens concatenate in shard order (``sort_array`` on (shard, tokens)
    structs keeps the assembly distributed); ``n_tok`` re-derives from
    the assembled array, preserving the per-row invariant.
    """
    keyed = with_shard_key(df)
    return (
        keyed.groupBy(F.col("base_doc_id").alias("doc_id"))
        .agg(
            # min, not first: deterministic if shards of one doc ever
            # disagreed on source (first is partition-order dependent)
            F.min("source").alias("source"),
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("shard", "tokens"))),
                    lambda s: s["tokens"],
                )
            ).alias("tokens"),
        )
        .withColumn("n_tok", F.size("tokens"))
        .select("doc_id", "tokens", "n_tok", "source")
    )


def shard_consistency(df: DataFrame) -> DataFrame:
    """Per-source shard-count uniformity report; a source passes iff all
    its logical docs have the same number of shards."""
    keyed = with_shard_key(df)
    per_doc = keyed.groupBy("source", "base_doc_id").agg(
        F.count("*").alias("n_shards")
    )
    return per_doc.groupBy("source").agg(
        F.countDistinct("n_shards").alias("distinct_shard_counts"),
        F.min("n_shards").alias("min_shards"),
        F.max("n_shards").alias("max_shards"),
        (F.countDistinct("n_shards") == 1).alias("consistent"),
    )
