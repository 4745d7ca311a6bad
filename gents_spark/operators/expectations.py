"""Declarative data-quality expectations — the Great-Expectations-lite
surface a pipeline runs BEFORE trusting a new drop of data.

``plans/audit.py`` checks the engine's own OUTPUTS (file layout, chunk
conformance); this checks INPUTS against caller-declared invariants
("value in range", "type from the known set", "timestamp inside the
contract window", "props parse as JSON") and reports one row per rule:
how many rows violate it and the violation rate.  GenTS's analog is
the validity screen (``gents/hfcollection.py:744-766`` structural
checks) — this generalizes it to arbitrary column predicates.

Semantics: a rule is a BOOLEAN Column; a row passes only when the
predicate is TRUE — NULL counts as a violation (SQL three-valued logic
would otherwise let a NULL-ridden column pass every range check).

Scale shape: ONE aggregation over one scan regardless of rule count —
every rule is a ``sum(CASE WHEN ...)`` inside the same map-side
partial agg, so 50 expectations cost the same shuffle (one 1-row
exchange) as one.  The long (rule, counts) output comes from exploding
the single aggregated row driver-free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def check_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Evaluate every rule in one aggregation pass.

    Output: one row per rule — ``(rule, n_rows, n_violations,
    violation_rate)``, rate = the one double division (round 9),
    rows ordered by the caller's dict order via the rule name.
    """
    if not rules:
        raise ValueError("rules must be a non-empty {name: Column} dict")
    aggs = [F.count("*").alias("_n")]
    for i, cond in enumerate(rules.values()):
        aggs.append(
            F.sum(F.when(cond, 0).otherwise(1)).alias(f"_v{i}")
        )
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_v{i}").cast("long").alias("n_violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    out = one.select(
        F.col("_n").cast("long").alias("n_rows"),
        F.explode(entries).alias("_e"),
    )
    return out.select(
        F.col("_e.rule").alias("rule"),
        "n_rows",
        F.col("_e.n_violations").alias("n_violations"),
        F.round(
            F.col("_e.n_violations").cast("double")
            / F.col("n_rows").cast("double"),
            9,
        ).alias("violation_rate"),
    )
