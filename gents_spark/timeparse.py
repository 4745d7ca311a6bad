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
