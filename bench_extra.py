"""Per-query isolation bench + plan dumper (guide §1.4 noop-sink method).

NOT the driver's bench (bench.py is frozen): this harness times individual
registry queries via the noop sink, with warm-up and N repeats, and dumps
``.explain("formatted")`` output for the plans/r06 deliverable.

Usage:
  python bench_extra.py time  <sf_dir> <repeats> <query> [query ...]
  python bench_extra.py plan  <sf_dir> <out_dir> <suffix> <query> [query ...]
  python bench_extra.py all   <sf_dir> <repeats>          # every BENCH query
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gents_spark.driver_queries import QUERIES  # noqa: E402
from gents_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORK = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def _spark():
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="gents_spark-bench-extra",
        shuffle_partitions=max(2 * CPUS, 16),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
            "spark.local.dir": f"{WORK}/gents_benchx_spark_local",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def time_queries(sf_dir: str, repeats: int, names: list[str]) -> None:
    spark = _spark()
    out: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name}#r{rep}")
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name].append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    print(json.dumps({n: {"min": min(v), "samples": v} for n, v in out.items()}))
    spark.stop()


def dump_plans(sf_dir: str, out_dir: str, suffix: str, names: list[str]) -> None:
    spark = _spark()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "time":
        time_queries(sys.argv[2], int(sys.argv[3]), sys.argv[4:])
    elif mode == "plan":
        dump_plans(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5:])
    elif mode == "all":
        import bench

        time_queries(sys.argv[2], int(sys.argv[3]), list(bench.BENCH_QUERIES))
    else:
        raise SystemExit(f"unknown mode {mode}")
