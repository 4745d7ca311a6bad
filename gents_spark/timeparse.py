"""Event-time derivation and input validation.

The engine's input is exactly the hinted shape
``(doc_id string, tokens array<int>, n_tok int, source string)``; event
time is derived *from the record itself* — ``doc_id = "<source>/<seq>"``
with ``event_time = EPOCH0 + seq * step_s`` — mirroring how GenTS derives
time from inside each history file rather than a dedicated input column
(reference: ``gents/meta.py:164-179`` time decode;
``gents/hfcollection.py:145-190`` filename-prefix grouping).

Validity filtering is the analog of GenTS's ``check_validity``
(``gents/hfcollection.py:744-766``) + ``netCDFMeta.is_valid``
(``gents/meta.py:347-368``): rows with unusable time or broken invariants
are quarantined, not silently dropped.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Deterministic fixture epoch (FIXTURES.md).
EPOCH0 = "2026-01-01 00:00:00"

_SEQ_RE = r"^[^/]+/(\d+)(?:#\d+)?$"
_SRC_RE = r"^([^/]+)/\d+(?:#\d+)?$"


def parse_seq(df: DataFrame, doc_id: str = "doc_id") -> DataFrame:
    """Add ``seq`` (bigint) and ``src_parsed`` parsed out of doc_id.

    Unparseable doc_ids yield NULL (regexp_extract returns '' -> null via
    nullif) instead of raising under ANSI mode.
    """
    seq_str = F.nullif(F.regexp_extract(F.col(doc_id), _SEQ_RE, 1), F.lit(""))
    src_str = F.nullif(F.regexp_extract(F.col(doc_id), _SRC_RE, 1), F.lit(""))
    return df.withColumn("seq", seq_str.cast("bigint")).withColumn(
        "src_parsed", src_str
    )


def with_event_time(
    df: DataFrame,
    step_s: int,
    epoch0: str = EPOCH0,
    doc_id: str = "doc_id",
) -> DataFrame:
    """Derive ``event_time = epoch0 + seq * step_s`` seconds.

    Pure column arithmetic — stays in whole-stage codegen; no UDF.
    """
    out = parse_seq(df, doc_id)
    return out.withColumn(
        "event_time",
        F.timestamp_add(
            "SECOND", F.col("seq") * F.lit(step_s), F.lit(epoch0).cast("timestamp")
        ),
    ).drop("src_parsed")


def fingerprint_col(doc_id: str = "doc_id") -> F.Column:
    """Structural fingerprint of a record — the schema-variant marker.

    The GenTS analog is the variable-set fingerprint of a history file
    (``hfcollection.py:311-359``): files are grouped by which variables
    they carry.  For the fixed 4-column sequence shape the structural
    variants live in the doc_id format: plain ``src/seq`` vs sharded
    ``src/seq#k`` vs anything else.
    """
    d = F.col(doc_id)
    return (
        F.when(d.rlike(r"^[^/]+/\d+$"), F.lit("plain"))
        .when(d.rlike(r"^[^/]+/\d+#\d+$"), F.lit("sharded"))
        .otherwise(F.lit("other"))
    )


def split_modal_fingerprint(
    df: DataFrame, group_col: str = "source"
) -> tuple[DataFrame, DataFrame]:
    """(majority, outliers): F7 as an engine operator.

    Per group, rows whose structural fingerprint differs from the
    group's STRICT-majority fingerprint are quarantined; on a tie for
    the largest set everything is kept — exactly GenTS's
    ``filter_by_variables`` rule (``hfcollection.py:349-355``: outliers
    drop only when the majority set is unique).

    Plan shape: one (group, fingerprint) count aggregation (tiny), a
    per-group window over it, then a broadcast join back — no shuffle of
    the data rows beyond the map-side-combined count.
    """
    fp = fingerprint_col().alias("_fp")
    counts = df.select(group_col, fp).groupBy(group_col, "_fp").count()
    top = counts.groupBy(group_col).agg(F.max("count").alias("_n1"))
    modal = (
        counts.join(top, group_col)
        .filter(F.col("count") == F.col("_n1"))
        .groupBy(group_col)
        .agg(
            (F.count("*") == 1).alias("_enforce"),  # strict majority only
            F.min("_fp").alias("_modal_fp"),
        )
    )
    tagged = df.withColumn("_fp", fingerprint_col()).join(
        F.broadcast(modal), group_col, "left"
    )
    keep = (~F.col("_enforce")) | (F.col("_fp") == F.col("_modal_fp"))
    majority = tagged.filter(keep).drop("_fp", "_modal_fp", "_enforce")
    outliers = tagged.filter(~keep).drop("_fp", "_modal_fp", "_enforce")
    return majority, outliers


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) split.

    Invalid: unparseable doc_id, missing source, or ``n_tok != size(tokens)``
    (the per-row invariant from BASELINE.json input_hint).
    """
    checked = parse_seq(df)
    ok = (
        F.col("seq").isNotNull()
        & F.col("src_parsed").isNotNull()
        & F.col("source").isNotNull()
        & (F.col("n_tok") == F.size("tokens"))
    )
    valid = checked.filter(ok).drop("seq", "src_parsed")
    quarantined = checked.filter(~F.coalesce(ok, F.lit(False))).drop(
        "seq", "src_parsed"
    )
    return valid, quarantined
