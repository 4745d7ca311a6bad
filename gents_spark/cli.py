"""CLI entry point — the spark-submit surface (SURVEY.md §7.1 M7).

Mirrors GenTS's CLI semantics (``gents/cli.py:5-118``): input location,
include/exclude source filters, tier selection (the slice-size analog),
dry-run, overwrite-vs-resume — re-expressed for spark-submit:

  spark-submit --py-files gents_spark.zip -m gents_spark.cli \\
      --input /data/sequences --output /data/tiers_out \\
      --tiers 1m 1h 1d --gapfill locf --step-s 10 --resume

GenTS's ``gents_command`` provenance attribute (``cli.py:197``) becomes
the run_id + argv row in the lineage manifest.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from gents_spark.operators.rollup import TIER_ORDER
from gents_spark.pipeline import TierPipeline
from gents_spark.session import get_spark


def parse_arguments(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="gents-spark",
        description="PySpark time-series rollup + retention engine",
    )
    p.add_argument("--input", required=True, help="sequences table path (parquet)")
    p.add_argument("--output", required=True, help="output dir (tiers + manifest)")
    p.add_argument("--tiers", nargs="+", default=TIER_ORDER, choices=TIER_ORDER)
    p.add_argument("--gapfill", choices=["locf", "linear", "none"], default="locf")
    p.add_argument("--step-s", type=int, default=10,
                   help="seconds per doc_id sequence step (event-time derivation)")
    p.add_argument("--include-sources", nargs="*", default=None)
    p.add_argument("--exclude-sources", nargs="*", default=None)
    p.add_argument("--resume", action="store_true",
                   help="skip chunks already committed in the manifest")
    p.add_argument("--overwrite", action="store_true",
                   help="ignore the manifest and rebuild everything")
    p.add_argument("--dryrun", action="store_true",
                   help="plan only: print chunk counts, write nothing")
    p.add_argument("--n-salt", type=int, default=16)
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_arguments(argv)
    spark = get_spark(master=args.master, app_name="gents-spark-cli")
    seqs = spark.read.parquet(args.input)
    pipe = TierPipeline(
        spark,
        step_s=args.step_s,
        tiers=list(args.tiers),
        gapfill_mode=None if args.gapfill == "none" else args.gapfill,
        include_sources=args.include_sources,
        exclude_sources=args.exclude_sources,
        n_salt=args.n_salt,
    )
    if args.dryrun:
        raw, bad = pipe.prepare(seqs)
        import pyspark.sql.functions as F

        plan = {
            "valid_rows": raw.count(),
            "quarantined_rows": bad.count(),
            "sources": raw.select("source").distinct().count(),
            "chunks_per_tier": {
                t: raw.select(
                    F.date_format(F.date_trunc("day", "event_time"), "yyyy-MM-dd")
                ).distinct().count()
                for t in args.tiers
            },
        }
        print(json.dumps({"dryrun": plan}))
        return 0
    run_id = f"cli-{int(time.time())}"
    metrics = pipe.run(
        seqs, args.output, resume=args.resume and not args.overwrite, run_id=run_id
    )
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
