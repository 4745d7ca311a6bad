"""Output conformance audit (SURVEY.md §2.1 S12).

GenTS checks every written file for contiguous time storage and >=4 MiB
chunk sizing (``gents/timeseries.py:49-81``).  The Spark analog audits
the physical layout of a written tier: files per chunk partition and
bytes per file — small-file explosions are the #1 silent killer of
100 TB table scans (every file is an open + a task).  On Iceberg this
query runs against the ``tbl.files`` metadata table; on the parquet
sandbox layout it walks the chunk directories.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

AUDIT_SCHEMA = (
    "tier string, chunk string, n_files int, total_bytes long, "
    "min_file_bytes long, max_file_bytes long, small_files int"
)

#: files smaller than this are flagged (GenTS's 4 MiB conform threshold,
#: scaled down for sandbox data sizes via the parameter below)
DEFAULT_MIN_FILE_BYTES = 4 * 1024 * 1024


def audit_tier_files(
    spark: SparkSession,
    tiers_dir: str,
    min_file_bytes: int = DEFAULT_MIN_FILE_BYTES,
) -> DataFrame:
    """Per-(tier, chunk) physical-layout stats with small-file flags."""
    rows = []
    for tier_dir in sorted(os.listdir(tiers_dir)):
        if not tier_dir.startswith("tier="):
            continue
        tier = tier_dir.split("=", 1)[1]
        tpath = os.path.join(tiers_dir, tier_dir)
        for chunk_dir in sorted(os.listdir(tpath)):
            if not chunk_dir.startswith("chunk="):
                continue
            chunk = chunk_dir.split("=", 1)[1]
            sizes = [
                os.path.getsize(os.path.join(tpath, chunk_dir, f))
                for f in os.listdir(os.path.join(tpath, chunk_dir))
                if f.endswith(".parquet")
            ]
            if not sizes:
                continue
            rows.append(
                (
                    tier,
                    chunk,
                    len(sizes),
                    sum(sizes),
                    min(sizes),
                    max(sizes),
                    sum(1 for s in sizes if s < min_file_bytes),
                )
            )
    return spark.createDataFrame(rows, AUDIT_SCHEMA)


def conformance_violations(
    audit: DataFrame, max_files_per_chunk: int = 4
) -> DataFrame:
    """Chunks violating the one-writer-per-chunk layout contract."""
    from pyspark.sql import functions as F

    return audit.filter(F.col("n_files") > max_files_per_chunk)
