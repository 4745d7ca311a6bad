"""Pin the tier-build N->4N residual to the platform shuffle, not the
job shape.

Times three primitive jobs on the SAME bench input at a given master:

- ``scan``   : map-only — parquet scan + per-row arithmetic + noop sink
               (no exchange at all);
- ``shuffle``: ONE full hash exchange of the same rows (repartition on
               the tier keys) + noop sink — exactly the pipeline's one
               big shuffle, with none of its aggregation work;
- ``agg``    : the exchange plus the first tier groupBy (partial+final),
               the minimal "real" shuffle consumer.

If scan scales ~linearly from N to 4N executors while shuffle does not,
the efficiency gap of the full tier build is a property of cross-JVM
shuffle on this host (serialization + localhost sockets + fetch), not
of the engine's job structure — the engine contributes ONE such
exchange, the theoretical minimum for a key-partitioned build.

Usage: taskset -c <cores> python tools/shuffle_probe.py <master> [reps]
Prints one JSON line per job kind.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from bench import STEP_S, ensure_input  # noqa: E402
from gents_spark.session import get_spark  # noqa: E402

WORK = "/dev/shm/gents_exp"


def main() -> None:
    master = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import pyspark.sql.functions as F

    conf = {
        "spark.ui.enabled": "false",
        "spark.local.dir": WORK + "/spark-local",
        "spark.driver.memory": "8g",
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.speculation": "true",
        "spark.speculation.multiplier": "2",
        "spark.speculation.quantile": "0.75",
    }
    if master.startswith("local-cluster"):
        conf["spark.executor.memory"] = "12g"
        conf["spark.executor.extraJavaOptions"] = (
            "-XX:ParallelGCThreads=2 -XX:ConcGCThreads=1"
        )
    spark = get_spark(
        master=master, app_name="shuffle-probe",
        shuffle_partitions=32, extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if master.startswith("local-cluster"):
        import subprocess

        subprocess.run(
            [sys.executable, "tools/make_package.py"], check=True,
            capture_output=True,
        )
        spark.sparkContext.addPyFile("dist/gents_spark.zip")

    import shutil

    in_path = ensure_input(spark)
    shm_in = WORK + "/" + in_path.rsplit("/", 1)[-1]
    if not shutil.os.path.exists(shm_in):
        shutil.copytree(in_path, shm_in)
    seqs = spark.read.parquet(shm_in)

    from gents_spark.timeparse import with_event_time

    raw = with_event_time(seqs, step_s=STEP_S).select(
        "source", "event_time", "n_tok"
    )
    kinds = {
        # map-only: scan + arithmetic, zero exchange
        "scan": lambda: raw.select(
            (F.col("n_tok") * 3 + F.dayofmonth("event_time")).alias("x")
        ),
        # the pipeline's one big exchange, nothing else
        "shuffle": lambda: raw.withColumn(
            "_gchunk", F.date_trunc("month", "event_time")
        ).repartition(32, "source", "_gchunk"),
        # exchange + first tier aggregation
        "agg": lambda: raw.withColumn(
            "_gchunk", F.date_trunc("month", "event_time")
        )
        .repartition(32, "source", "_gchunk")
        .groupBy("source", "_gchunk", F.date_trunc("minute", "event_time"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_tok").alias("sum_tok"),
            F.min("n_tok").alias("mn"),
            F.max("n_tok").alias("mx"),
        ),
    }
    out = {"master": master}
    for name, mk in kinds.items():
        mk().write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 2))
        out[name] = {"times": ts, "best": min(ts)}

    # write-path kinds: same aggregated tier rows, three commit
    # strategies — the suspect is driver-serial commit work, which is
    # constant across cluster sizes and so caps N->4N efficiency.
    tier = (
        raw.withColumn("_gchunk", F.date_trunc("month", "event_time"))
        .repartition(32, "source", "_gchunk")
        .groupBy("source", "_gchunk", F.date_trunc("minute", "event_time").alias("b"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_tok").alias("sum_tok"),
        )
        .withColumn("chunk", F.date_format("_gchunk", "yyyy-MM"))
    )

    def w_dynamic():
        (
            tier.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("chunk")
            .parquet(WORK + "/probe_dyn")
        )

    def w_fresh():
        shutil.rmtree(WORK + "/probe_fresh", ignore_errors=True)
        (
            tier.write.mode("append")
            .partitionBy("chunk")
            .parquet(WORK + "/probe_fresh")
        )

    def w_fresh_v2():
        shutil.rmtree(WORK + "/probe_v2", ignore_errors=True)
        spark.conf.set(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
        (
            tier.write.mode("append")
            .partitionBy("chunk")
            .parquet(WORK + "/probe_v2")
        )
        spark.conf.unset(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version"
        )

    for name, fn in (
        ("write_dynamic", w_dynamic),
        ("write_fresh", w_fresh),
        ("write_fresh_v2", w_fresh_v2),
    ):
        fn()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 2))
        out[name] = {"times": ts, "best": min(ts)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
