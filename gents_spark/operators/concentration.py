"""Weight-concentration census: Gini coefficient and top-entity share.

A training-data pipeline mixing many sources needs to know, per time
slice, how concentrated the token volume is — a day where one user /
source supplies half the tokens skews any mixture trained on it
(``weighted_mix`` consumes these shares as diagnostics).  GenTS has no
distributional QC at all (its checks are structural,
``gents/hfcollection.py:744-766``); this is the inequality view a
volume dashboard starts from.

``gini_concentration`` computes, per group, the Gini coefficient of an
integer weight across entities using the exact rank formula over the
ascending-sorted weights ``x_1 <= ... <= x_n``::

    G = (2 * Σ i·x_i  -  (n + 1) * Σ x_i)  /  (n * Σ x_i)

Every sum is an exact BIGINT (ranks are ``row_number`` over
``(weight, entity)`` — the entity tie-break makes ranks deterministic,
and because tied weights contribute identically to ``Σ i·x_i`` under any
permutation of their ranks, the statistic itself is tie-order
invariant).  The only doubles are the two final single divisions
(mirrored expression-for-expression by the DuckDB oracle twin, so the
output hash-matches).

Scale shape: one partial-agg groupBy on (group, entity), one window
rank per group (bounded by the entity cardinality per group), one
partial-agg groupBy on group.  No UDF, no self-join, no collect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def gini_concentration(
    df: DataFrame,
    group: str = "day",
    entity: str = "user_id",
    weight: str = "w",
) -> DataFrame:
    """Per-``group`` Gini coefficient + top-1 share of integer
    ``weight`` summed per ``entity``.

    Returns one row per group: ``n_entities``, ``total`` (bigint sum of
    weights), ``gini`` (0 = perfectly even, -> 1 = one entity holds
    all; rounded to 9 dp), ``top_share`` (largest entity's fraction of
    the total, rounded to 9 dp).  Groups with ``total <= 0`` emit NULL
    for both ratios (the statistic is undefined there).
    """
    per = df.groupBy(group, entity).agg(
        F.sum(F.col(weight).cast("long")).alias("_x")
    )
    rw = Window.partitionBy(group).orderBy("_x", entity)
    ranked = per.withColumn("_i", F.row_number().over(rw).cast("long"))
    g = ranked.groupBy(group).agg(
        F.count("*").alias("n_entities"),
        F.sum("_x").alias("total"),
        F.max("_x").alias("_mx"),
        F.sum(F.col("_i") * F.col("_x")).alias("_ix"),
    )
    num = F.lit(2).cast("long") * F.col("_ix") - (
        F.col("n_entities") + F.lit(1).cast("long")
    ) * F.col("total")
    den = F.col("n_entities") * F.col("total")
    pos = F.col("total") > F.lit(0)
    return g.select(
        group,
        "n_entities",
        "total",
        F.when(
            pos, F.round(num.cast("double") / den.cast("double"), 9)
        ).alias("gini"),
        F.when(
            pos,
            F.round(
                F.col("_mx").cast("double") / F.col("total").cast("double"),
                9,
            ),
        ).alias("top_share"),
    )
