"""Per-stage scaling attribution: which pipeline stage limits N->4N.

Times three isolated stages under the same pinned local-cluster protocol
as run_scaling.py (invoke under taskset):

  rollup1m — the bulk compute: raw scan -> 1m continuous aggregate with
             exact percentiles, materialized via noop sink
  gapfill  — 1m tier -> LOCF gap-fill, noop sink
  e2e      — the full checkpointed pipeline (reference point)

Usage: taskset -c 0-1 python tools/stage_scaling.py 'local-cluster[1,2,14336]' 2
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time

sys.path.insert(0, ".")

from bench import STEP_S, ensure_input  # noqa: E402
from gents_spark.operators.gapfill import gapfill  # noqa: E402
from gents_spark.operators.rollup import rollup  # noqa: E402
from gents_spark.session import get_spark  # noqa: E402
from gents_spark.timeparse import with_event_time  # noqa: E402

WORK = "/dev/shm/gents_exp"


def main() -> None:
    master = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(
        master=master,
        app_name="stage-scaling",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.local.dir": WORK + "/spark-local",
            "spark.driver.memory": "8g",
            "spark.executor.memory": "12g",
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if master.startswith("local-cluster"):
        subprocess.run(
            [sys.executable, "tools/make_package.py"], check=True,
            capture_output=True,
        )
        spark.sparkContext.addPyFile("dist/gents_spark.zip")
    in_path = ensure_input(spark)
    shm_in = WORK + "/" + shutil.os.path.basename(in_path)
    if not shutil.os.path.exists(shm_in):
        shutil.copytree(in_path, shm_in)
    seqs = spark.read.parquet(shm_in)
    raw = with_event_time(seqs, step_s=STEP_S).select(
        "source", "event_time", "n_tok"
    )

    def bench(name, df_fn):
        df_fn().write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 2))
        return ts

    tier1m = rollup(raw, "1m")
    out = {
        "master": master,
        "rollup1m": bench("rollup1m", lambda: rollup(raw, "1m")),
        "gapfill": bench(
            "gapfill", lambda: gapfill(tier1m, "1m", mode="locf")
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
