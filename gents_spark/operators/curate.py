"""End-to-end corpus curation verdict — the composed screen a training
pipeline actually runs, as ONE auditable decision table.

The individual screens (``textstats.quality_filter``,
``dedup.exact_dedup_groups``, ``sampling.hash_frac``) each answer one
question; production curation applies them together, and the artifact
operators teams keep is the per-document decision table — every doc
with WHY it was kept or dropped (the lineage auditors and ablation
studies ask for), not just the surviving subset.  Reference analog:
GenTS chains validity -> majority-schema -> order filters before any
output (``gents/hfcollection.py:744-766``); this is the same
filter-chain idea over the LLM-corpus screens.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from gents_spark.operators.dedup import exact_dedup_groups
from gents_spark.operators.sampling import hash_frac
from gents_spark.operators.textstats import quality_filter


def curate_corpus(
    docs: DataFrame,
    sample_frac: float = 0.5,
    prefix_words: int = 5,
    **quality_kwargs,
) -> DataFrame:
    """Per-doc curation verdict: quality screen (Gopher rules) AND
    exact-dedup canonicality AND a deterministic content-addressed
    sample, composed into ``final_keep`` with each stage's verdict kept
    as its own column.

    Stage semantics (each independently gate-verified elsewhere):

    - ``passed_quality``: ``quality_filter``'s keep (drop_reasons kept
      as a comma string for auditability);
    - ``is_canonical``: the doc is its exact-dup group's representative
      (min doc_id over the ``prefix_words`` fingerprint) — dups drop,
      one survivor per group stays;
    - ``sampled``: ``hash_frac(doc_id) < sample_frac`` — md5
      content-addressed, so reruns and engines agree bit-for-bit.

    Scale shape: quality is map-side except its bigram top-1 (one
    doc-keyed aggregation), dedup is one window over the fingerprint;
    the composition adds ONE doc_id equi-join of the two per-doc
    verdict tables, and the sample verdict is a pure map-side
    projection of doc_id on the joined result — no third branch, no
    extra shuffle.  No stage sees the text twice.
    """
    if not 0.0 < sample_frac <= 1.0:
        raise ValueError(f"sample_frac={sample_frac}: expected (0, 1]")
    q = quality_filter(docs, **quality_kwargs).select(
        "doc_id",
        F.col("keep").alias("passed_quality"),
        F.array_join("drop_reasons", ",").alias("drop_reasons"),
    )
    d = exact_dedup_groups(docs, prefix_words=prefix_words).select(
        "doc_id",
        (F.col("canonical_doc_id") == F.col("doc_id")).alias("is_canonical"),
    )
    return (
        q.join(d, "doc_id")
        .withColumn(
            "sampled",
            hash_frac(F.col("doc_id")) < F.lit(float(sample_frac)),
        )
        .select(
            "doc_id",
            "passed_quality",
            "is_canonical",
            "sampled",
            (
                F.col("passed_quality")
                & F.col("is_canonical")
                & F.col("sampled")
            ).alias("final_keep"),
            "drop_reasons",
        )
    )
