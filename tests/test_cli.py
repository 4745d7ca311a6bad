"""CLI parsing + end-to-end run (analog of gents/tests/test_cli.py)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from gents_spark.cli import main, parse_arguments
from gents_spark.plans.manifest import read_tier
from gents_spark.synth import synth_sequences


def test_parse_defaults():
    a = parse_arguments(["--input", "/i", "--output", "/o"])
    assert a.tiers == ["1m", "1h", "1d"]
    assert a.gapfill == "locf"
    assert not a.resume and not a.dryrun


def test_cli_end_to_end(spark, tmp_path, capsys):
    in_path = str(tmp_path / "seqs")
    out = str(tmp_path / "out")
    synth_sequences(spark, 2, 300).write.parquet(in_path)

    rc = main([
        "--input", in_path, "--output", out,
        "--tiers", "1d", "--gapfill", "none",
        "--step-s", "3600", "--master", "local[4]",
    ])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["tiers"]["1d"]["written"] > 0
    assert read_tier(spark, out + "/tiers", "1d").count() > 0


def test_cli_dryrun_writes_nothing(spark, tmp_path, capsys):
    in_path = str(tmp_path / "seqs2")
    out = str(tmp_path / "out2")
    synth_sequences(spark, 1, 100).write.parquet(in_path)
    rc = main([
        "--input", in_path, "--output", out,
        "--dryrun", "--master", "local[4]",
    ])
    assert rc == 0
    plan = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["dryrun"]
    assert plan["valid_rows"] == 100
    import os

    assert not os.path.exists(out)


def test_cli_empty_after_quarantine(spark, tmp_path, capsys):
    """All-invalid input (bad doc_id shape) yields zero-written metrics,
    not a crash (round-1 ADVICE: _planned_chunks None.strftime)."""
    in_path = str(tmp_path / "seqs_bad")
    out = str(tmp_path / "out_bad")
    bad = synth_sequences(spark, 1, 50).withColumn("doc_id", F.lit("nope"))
    bad.write.parquet(in_path)
    rc = main([
        "--input", in_path, "--output", out,
        "--tiers", "1m", "--gapfill", "none", "--master", "local[4]",
    ])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["quarantined_rows"] == 50
    assert metrics["tiers"]["1m"]["written"] == 0
    assert metrics["tiers"]["1m"]["rows_written"] == 0


def test_cli_include_filter(spark, tmp_path, capsys):
    in_path = str(tmp_path / "seqs3")
    out = str(tmp_path / "out3")
    synth_sequences(spark, 3, 100).write.parquet(in_path)
    rc = main([
        "--input", in_path, "--output", out,
        "--tiers", "1d", "--gapfill", "none", "--step-s", "3600",
        "--include-sources", "src_00", "--master", "local[4]",
    ])
    assert rc == 0
    t = read_tier(spark, out + "/tiers", "1d")
    assert t.select("source").distinct().collect()[0]["source"] == "src_00"
