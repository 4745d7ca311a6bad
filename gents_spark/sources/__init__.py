"""Input-table resolution: Iceberg catalog tables or parquet paths."""

from gents_spark.sources.iceberg import (  # noqa: F401
    ICEBERG_CONFS,
    iceberg_available,
    open_sequences,
)
