"""Synthesis determinism + input invariants (M0).

Analog of the reference's fixture self-tests
(``gents/tests/test_case_files.py:10-41``).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from gents_spark.synth import synth_sequences
from gents_spark.timeparse import split_valid, with_event_time


def test_schema_is_exactly_input_hint(spark):
    df = synth_sequences(spark, n_sources=2, seqs_per_source=10)
    assert [f.name for f in df.schema.fields] == ["doc_id", "tokens", "n_tok", "source"]
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["doc_id"] == "string"
    assert kinds["tokens"] == "array<int>"
    assert kinds["n_tok"] == "int"
    assert kinds["source"] == "string"


def test_n_tok_invariant(spark):
    df = synth_sequences(spark, n_sources=2, seqs_per_source=50)
    assert df.filter(F.col("n_tok") != F.size("tokens")).count() == 0


def test_partitioning_invariance(spark):
    """Same logical table regardless of partition count — the property
    that makes the generator valid at cluster scale (SURVEY.md §7.3)."""
    a = synth_sequences(spark, 2, 100, num_partitions=1).orderBy("doc_id").collect()
    b = synth_sequences(spark, 2, 100, num_partitions=16).orderBy("doc_id").collect()
    assert a == b


def test_event_time_derivation(spark):
    df = with_event_time(synth_sequences(spark, 1, 10), step_s=60)
    rows = df.orderBy("doc_id").select("event_time").collect()
    assert rows[0][0].isoformat() == "2026-01-01T00:00:00"
    assert rows[1][0].isoformat() == "2026-01-01T00:01:00"


def test_validity_quarantine(spark):
    """Analog of check_validity (hfcollection.py:744-766): malformed
    doc_ids and broken n_tok invariants are quarantined, not dropped."""
    good = synth_sequences(spark, 1, 5)
    bad = spark.createDataFrame(
        [
            ("no-slash", [1, 2], 2, "src_00"),        # unparseable doc_id
            ("src_00/notanum", [1], 1, "src_00"),     # non-numeric seq
            ("src_00/0000000099", [1, 2, 3], 7, "src_00"),  # n_tok mismatch
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    valid, quarantined = split_valid(good.unionByName(bad))
    assert valid.count() == 5
    assert quarantined.count() == 3


def test_gap_fixture_removes_buckets(spark):
    df = synth_sequences(
        spark, 2, 120, gap_every=7, gap_source="src_01", rows_per_bucket=6
    )
    full = synth_sequences(spark, 2, 120)
    assert df.count() < full.count()
    assert df.filter("source = 'src_00'").count() == 120


def test_skew_fixture_hot_source(spark):
    df = synth_sequences(spark, 5, 200, hot_source_frac=0.5)
    counts = {r["source"]: r["cnt"] for r in
              df.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert counts["src_00"] >= 0.45 * sum(counts.values())


def test_modal_fingerprint_quarantine(spark, tmp_path):
    """F7 as an engine operator: per-source structural-fingerprint
    outliers land in quarantine (parquet) and metrics count them; a tie
    for the majority keeps everything (GenTS hfcollection.py:349-355)."""
    import os

    from gents_spark.pipeline import TierPipeline
    from gents_spark.timeparse import split_modal_fingerprint

    base = synth_sequences(spark, 2, 300)
    # src_00: 10 rows get a sharded doc_id variant -> minority fingerprint
    poisoned = base.withColumn(
        "doc_id",
        F.when(
            (F.col("source") == "src_00")
            & (F.xxhash64("doc_id") % 30 == 0),
            F.concat(F.col("doc_id"), F.lit("#1")),
        ).otherwise(F.col("doc_id")),
    )
    n_shard = poisoned.filter(F.col("doc_id").contains("#")).count()
    assert n_shard > 0

    keep, out = split_modal_fingerprint(poisoned)
    assert out.count() == n_shard
    assert keep.count() == poisoned.count() - n_shard
    assert out.filter(~F.col("doc_id").contains("#")).count() == 0

    # tie: 50/50 plain vs sharded in one source -> nothing quarantined
    half = base.filter(F.col("source") == "src_01")
    tied = half.withColumn(
        "doc_id",
        F.when(F.xxhash64("doc_id") % 2 == 0,
               F.concat(F.col("doc_id"), F.lit("#1"))
        ).otherwise(F.col("doc_id")),
    )
    n_plain = tied.filter(~F.col("doc_id").contains("#")).count()
    n_tied = tied.count()
    if n_plain * 2 == n_tied:  # exact tie under the hash split
        k2, o2 = split_modal_fingerprint(tied)
        assert o2.count() == 0

    # pipeline wiring: quarantine table written, metrics counted
    outdir = str(tmp_path / "f7")
    m = TierPipeline(
        spark, step_s=3600, tiers=["1d"], gapfill_mode=None,
        modal_quarantine=True,
    ).run(poisoned, outdir, run_id="f7")
    assert m["quarantined_rows"] == n_shard
    q = spark.read.parquet(os.path.join(outdir, "quarantine"))
    assert q.count() == n_shard
