"""Iceberg-table input seam (BASELINE: "Iceberg table of pre-tokenized
training sequences").

This container ships no Iceberg runtime jars, so the engine's durable
layer is the parquet + lineage-manifest analog (``plans/manifest`` —
snapshot membership, expire_snapshots, REPLACE-per-partition commits;
every mapping is documented at the call sites).  This module is the
CONCRETE seam for running against a real catalog: ``open_sequences``
resolves a table reference through ``spark.table`` when the Iceberg
extensions are on the classpath, and parquet paths otherwise —
pipeline, CLI and tests are reference-agnostic.

On a real cluster, enable the catalog with (spark-submit / conf):

    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    spark.sql.extensions=org.apache.iceberg.spark.extensions.\
IcebergSparkSessionExtensions
    spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.<name>.type=rest|hive|hadoop (+ warehouse/uri)

and pass ``--input <name>.db.sequences`` — nothing else changes: the
DataFrame the pipeline sees has the identical (doc_id, tokens, n_tok,
source) schema, Iceberg handles partition pruning/hidden partitioning
below the DataFrameReader, and the engine's own manifest still records
chunk lineage for resume (Iceberg snapshots version the DATA; the
manifest versions the BUILD).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: confs a real deployment sets (documented here; see module docstring)
ICEBERG_CONFS = {
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions"
        ".IcebergSparkSessionExtensions"
    ),
}


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is importable on the JVM
    classpath (runtime jar present)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _looks_like_table_ref(ref: str) -> bool:
    """``catalog.db.table`` vs a filesystem path: dotted, no slashes,
    and not an existing-file-ish suffix."""
    return (
        "/" not in ref
        and "\\" not in ref
        and "." in ref
        and not ref.endswith(".parquet")
    )


#: the hinted input shape (BASELINE input_hint) — passed EXPLICITLY to
#: the JSONL reader: schema inference costs a full extra pass over the
#: data, which at 10^12 sequences is a second read of the corpus
SEQ_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def open_sequences(spark: SparkSession, ref: str) -> DataFrame:
    """Resolve the sequences input: an Iceberg/catalog table reference
    (``catalog.db.table`` — requires the runtime jar + catalog conf,
    see module docstring), a parquet path/directory, or a JSONL
    path/directory (``.jsonl``/``.json`` suffix; read with the explicit
    hinted schema — no inference pass, malformed lines become NULL
    doc_ids that the validity quarantine catches downstream).

    Raises a configuration-pointing error when a table reference is
    used without a catalog, instead of Spark's bare
    ``TABLE_OR_VIEW_NOT_FOUND``.
    """
    if ref.endswith((".jsonl", ".json")):
        return spark.read.schema(SEQ_SCHEMA).json(ref)
    if _looks_like_table_ref(ref):
        try:
            return spark.table(ref)
        except Exception as e:
            if iceberg_available(spark):
                raise
            raise RuntimeError(
                f"input {ref!r} looks like a catalog table reference, "
                "but no Iceberg runtime is on the classpath. Add the "
                "iceberg-spark-runtime package and the catalog confs "
                "(see gents_spark/sources/iceberg.py), or pass a "
                "parquet path."
            ) from e
    return spark.read.parquet(ref)
