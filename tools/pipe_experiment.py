"""One timed pipeline run under a chosen master/conf — the experiment
harness behind the local[32]-vs-local[8] regression investigation
(BENCH_r01: pipeline_raw_to_1d 88.9s at local[32] vs 32.7s at local[8]
on identical input).

Usage: python tools/pipe_experiment.py <master> [reps] [k=v ...]
  e.g. python tools/pipe_experiment.py 'local[32]' 2 shuffle=64 gc=32
       python tools/pipe_experiment.py 'local-cluster[4,8,12288]' 1
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from bench import CHUNK_GRAIN, STEP_S, ensure_input  # noqa: E402
from gents_spark.pipeline import TierPipeline  # noqa: E402
from gents_spark.session import get_spark  # noqa: E402

#: tmpfs work area: bench outputs on the virtio disk pick up host IO
#: stalls (measured: a 6s tier write intermittently takes 67s); tmpfs
#: isolates engine throughput from disk noise
WORK = "/dev/shm/gents_exp"


def main() -> None:
    master = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    opts = dict(kv.split("=", 1) for kv in sys.argv[3:])
    shuffle = int(opts.get("shuffle", "64"))
    conf = {
        "spark.ui.enabled": "false",
        # shuffle/spill files on tmpfs too, same disk-noise isolation
        "spark.local.dir": WORK + "/spark-local",
        "spark.driver.memory": opts.get("drivermem", "48g"),
    }
    if "maxpart" in opts:
        conf["spark.sql.files.maxPartitionBytes"] = opts["maxpart"]
    if "advisory" in opts:
        conf["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = opts["advisory"]
    if opts.get("spec"):
        # straggler mitigation: this host shows intermittent per-core
        # CPU steal (tools/membw_probe.py: random cores drop 2-10x for
        # seconds) — speculative execution re-launches the slow copy on
        # a healthy core, the standard cluster answer to sick executors
        conf["spark.speculation"] = "true"
        conf["spark.speculation.multiplier"] = "2"
        conf["spark.speculation.quantile"] = "0.75"
    if "codec" in opts:
        # shuffle/spill/broadcast byte compression (default lz4): the
        # round-3 probes pinned tier-build scaling residual to per-byte
        # cross-JVM shuffle cost, so a denser codec (zstd) trades CPU
        # for fewer exchanged bytes
        conf["spark.io.compression.codec"] = opts["codec"]
    if "gc" in opts:
        conf["spark.driver.extraJavaOptions"] = (
            f"-XX:ParallelGCThreads={opts['gc']} "
            f"-XX:ConcGCThreads={max(1, int(opts['gc']) // 4)}"
        )
    if master.startswith("local-cluster"):
        conf["spark.executor.memory"] = opts.get("execmem", "10g")
        # executor JVMs size GC threads from the CPU AFFINITY mask (the
        # whole pinned core set), not their 2-core slice — at 4N that is
        # 4 JVMs each running 8 GC threads on 8 shared cores.  Pin GC to
        # the per-executor core count so both cluster sizes pay the same
        # per-core GC cost.
        conf["spark.executor.extraJavaOptions"] = (
            "-XX:ParallelGCThreads=2 -XX:ConcGCThreads=1"
        )
    spark = get_spark(
        master=master,
        app_name="pipe-experiment",
        shuffle_partitions=shuffle,
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if master.startswith("local-cluster"):
        # multi-JVM executors spawn their own Python workers: ship the
        # engine the same way a real cluster run does (--py-files)
        import subprocess

        subprocess.run(
            [sys.executable, "tools/make_package.py"], check=True,
            capture_output=True,
        )
        spark.sparkContext.addPyFile("dist/gents_spark.zip")
    in_path = ensure_input(spark)
    # cache keyed by input basename — a stale fixed-name copy would
    # silently pin every run to the first input size ever used
    shm_in = WORK + "/" + shutil.os.path.basename(in_path)
    if not shutil.os.path.exists(shm_in):
        shutil.copytree(in_path, shm_in)
    seqs = spark.read.parquet(shm_in)
    pipe = TierPipeline(
        spark, step_s=STEP_S, gapfill_mode="locf", validate=False,
        chunk_grain=CHUNK_GRAIN,
    )
    # warm-up (JIT/codegen), untimed.  Deterministic hash sample, NOT
    # limit(): a LIMIT re-evaluates differently between the planning job
    # and the write job (no persisted snapshot anymore), so the planned
    # chunk set can miss every written row
    import pyspark.sql.functions as F

    warm = seqs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(512)) == 0)
    shutil.rmtree(WORK + "/pexp_warm", ignore_errors=True)
    pipe.run(warm, WORK + "/pexp_warm", resume=False, run_id="w")
    times = []
    points = 0
    details = []
    for rep in range(reps):
        shutil.rmtree(WORK + "/pexp_out", ignore_errors=True)
        t0 = time.time()
        m = pipe.run(seqs, WORK + "/pexp_out", resume=False, run_id=f"e{rep}")
        times.append(round(time.time() - t0, 2))
        points = sum(x["rows"] for x in m["tiers"].values())
        det = {
            t: {"s": x["seconds"], **x.get("phases", {})}
            for t, x in m["tiers"].items()
        }
        det["phases"] = m.get("phases", {})  # combined-write timings
        details.append(det)
    best = min(times)
    result = {
        "master": master, "shuffle": shuffle, "opts": opts,
        "times": times, "best": best,
        "points_per_sec": round(points / best, 1),
        "rolled_up_points": points,
        "input_sequences": seqs.count(),
        "details": details,
    }
    if opts.get("ingest"):
        # the other BASELINE metric: validate + Gorilla/DoD-encode a
        # quarter of the table via Arrow-batched pandas UDFs
        import pyspark.sql.functions as F

        from gents_spark.functions.codec_udfs import encode_tokens
        from gents_spark.timeparse import split_valid

        sl = seqs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(4)) == 0)
        valid, _bad = split_valid(sl)
        ing = valid.select(
            "doc_id", "source", "n_tok",
            encode_tokens("tokens").alias("tokens_payload"),
        )
        n_ing = sl.count()
        ing.write.format("noop").mode("overwrite").save()  # warm
        ing_times = []
        for _ in range(reps):
            t0 = time.time()
            ing.write.format("noop").mode("overwrite").save()
            ing_times.append(round(time.time() - t0, 2))
        result["ingest_times"] = ing_times
        result["ingest_sequences"] = n_ing
        result["seqs_per_sec"] = round(n_ing / min(ing_times), 1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
