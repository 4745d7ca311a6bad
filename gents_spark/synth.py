"""Deterministic, distributed synthesis of the input ``sequences`` table.

Schema is exactly the BASELINE.json input_hint:
``(doc_id string, tokens array<int>, n_tok int, source string)``.

Determinism strategy (SURVEY.md §7.3 "Deterministic synthesis at scale"):
every random draw is a pure column expression of (source, seq) via
``xxhash64`` — independent of partitioning, task order, and cluster size,
so the same logical table materializes identically at local[2] and on a
1000-executor cluster.  This is the Spark-native analog of the reference's
seeded fixture generator (``gents/tests/test_cases.py:30-115``).

All generation is JVM-side (``spark.range`` + ``transform``/``sequence``)
— no Python in the data path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

VOCAB = 50257  # GPT-2-ish vocab size per FIXTURES.md


def _u(seed_cols: list, lo: int, hi: int):
    """Uniform int draw in [lo, hi] as a deterministic column expr."""
    span = hi - lo + 1
    return (F.pmod(F.xxhash64(*seed_cols), F.lit(span)) + F.lit(lo)).cast("int")


def synth_sequences(
    spark: SparkSession,
    n_sources: int = 6,
    seqs_per_source: int = 2000,
    n_tok_lo: int = 64,
    n_tok_hi: int = 512,
    seed: int = 42,
    hot_source_frac: float | None = None,
    gap_every: int | None = None,
    gap_source: str | None = None,
    rows_per_bucket: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the seeded sequences table.

    ``hot_source_frac``: if set, src_00 gets that fraction of ALL rows
    (skew fixture — FIXTURES.md ``skewed``).  ``gap_every``/``gap_source``:
    delete every Nth minute-bucket (of ``rows_per_bucket`` rows) for one
    source (``gaps`` fixture).
    """
    total = n_sources * seqs_per_source
    base = spark.range(
        0, total, 1, num_partitions or spark.sparkContext.defaultParallelism
    )

    if hot_source_frac is not None:
        hot_rows = int(total * hot_source_frac)
        cold_per = max(1, (total - hot_rows) // max(1, n_sources - 1))
        src_idx = F.when(F.col("id") < hot_rows, F.lit(0)).otherwise(
            ((F.col("id") - hot_rows) / F.lit(cold_per)).cast("int")
            % (n_sources - 1)
            + 1
        )
        seq = (
            F.when(F.col("id") < hot_rows, F.col("id"))
            .otherwise(F.pmod(F.col("id") - hot_rows, F.lit(cold_per)))
            .cast("bigint")
        )
    else:
        src_idx = (F.col("id") / F.lit(seqs_per_source)).cast("int")
        seq = (F.col("id") % seqs_per_source).cast("bigint")

    df = (
        base.withColumn("source", F.format_string("src_%02d", src_idx))
        .withColumn("seq", seq)
        .withColumn(
            "doc_id", F.format_string("%s/%010d", F.col("source"), F.col("seq"))
        )
        .withColumn(
            "n_tok",
            _u([F.lit(seed), F.lit("ntok"), F.col("doc_id")], n_tok_lo, n_tok_hi),
        )
        .withColumn(
            "tokens",
            F.transform(
                F.sequence(F.lit(1), F.col("n_tok")),
                lambda i: (
                    F.pmod(F.xxhash64(F.lit(seed), F.col("doc_id"), i), F.lit(VOCAB))
                ).cast("int"),
            ),
        )
    )

    if gap_every and gap_source:
        bucket = (F.col("seq") / F.lit(rows_per_bucket)).cast("bigint")
        df = df.filter(
            ~(
                (F.col("source") == gap_source)
                & (F.pmod(bucket, F.lit(gap_every)) == 0)
            )
        )

    return df.select("doc_id", "tokens", "n_tok", "source")
