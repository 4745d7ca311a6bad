"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE on, skew-join handling,
partition coalescing, Arrow for the pandas-UDF codec path) while remaining
correct on local[N].  GenTS sizes two process pools by hand
(``gents/cli.py:78-88``); here AQE owns runtime parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that matter at cluster scale.  All are safe on local mode.
SCALE_CONFS: dict[str, str] = {
    # AQE: runtime re-planning — coalesce tiny shuffle partitions, split
    # skewed ones (GenTS has no analog; it assumes uniform groups).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas UDFs (the codec path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Timestamps in this engine are timezone-less event times.
    "spark.sql.session.timeZone": "UTC",
    # Keep shuffle file pressure sane on wide aggs.
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    # Parquet scans: 128m splits is the right grain for TB-scale files.
    "spark.sql.files.maxPartitionBytes": "128m",
    # Partition keys (tier=1d, chunk=2026-01-15) are STRING by design;
    # inference would read "1d" as the Java double literal 1.0 and
    # day-grain chunks as DATE.
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    # Let the planner pick shuffled-hash over sort-merge when the
    # per-partition build side fits (guide §3.1): same shuffle bytes,
    # no sort of either side.  AQE's runtime rewrite threshold below
    # converts planned sort-merge joins whose post-shuffle partitions
    # turn out small — both are size-gated, so genuinely large joins
    # still sort-merge and spill gracefully.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    # autoBroadcastJoinThreshold stays at the 10 MB default: raising it
    # to 32m was tried (r06) and measured 20-40% SLOWER on the n-gram
    # verify joins — the driver-serial build+ship of a multi-MB hash
    # relation costs more than a shuffled-hash join of the same table.
}


def get_spark(
    master: str | None = None,
    app_name: str = "gents_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master=None`` defers to the environment (spark-submit) and falls
    back to ``local[$SPARK_GRAFT_CPUS or *]`` for ad-hoc runs.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    for k, v in SCALE_CONFS.items():
        builder = builder.config(k, v)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
