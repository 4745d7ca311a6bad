"""Shard reunification (FIXTURES.md `fragmented`) — GenTS tile assembly
analog: reunified extent == union of fragments (test_workflow.py:228-230).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from gents_spark.operators.shards import reunify_shards, shard_consistency
from gents_spark.synth import synth_sequences


def _fragment(df, n_shards=3):
    """Split each row into n_shards rows carrying token slices."""
    shard = F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard")
    per = (F.size("tokens") + n_shards - 1) / n_shards
    frag = df.select("*", shard).select(
        F.concat_ws("#", "doc_id", F.col("shard").cast("string")).alias("doc_id"),
        F.slice(
            "tokens",
            (F.col("shard") * F.ceil(per)).cast("int") + 1,
            F.ceil(per).cast("int"),
        ).alias("tokens"),
        "source",
        "shard",
    )
    return frag.withColumn("n_tok", F.size("tokens")).drop("shard")


def test_reunify_restores_original(spark):
    orig = synth_sequences(spark, 2, 150, n_tok_lo=5, n_tok_hi=40)
    frags = _fragment(orig, n_shards=3)
    assert frags.count() == 3 * orig.count()

    rebuilt = reunify_shards(frags)
    a = {r["doc_id"]: (r["tokens"], r["n_tok"], r["source"])
         for r in orig.collect()}
    b = {r["doc_id"]: (r["tokens"], r["n_tok"], r["source"])
         for r in rebuilt.collect()}
    assert a == b  # exact token-array equality per logical doc


def test_shard_consistency_detects_missing_fragment(spark):
    orig = synth_sequences(spark, 1, 60, n_tok_lo=6, n_tok_hi=12)
    frags = _fragment(orig, n_shards=2)
    ok = shard_consistency(frags).collect()[0]
    assert ok["consistent"] and ok["max_shards"] == 2
    # drop one fragment -> inconsistent
    broken = frags.filter(F.col("doc_id") != frags.select("doc_id").first()[0])
    bad = shard_consistency(broken).collect()[0]
    assert not bad["consistent"]


def test_unsharded_rows_pass_through(spark):
    orig = synth_sequences(spark, 1, 50)
    rebuilt = reunify_shards(orig)
    assert rebuilt.count() == 50
    assert rebuilt.filter(F.col("n_tok") != F.size("tokens")).count() == 0
