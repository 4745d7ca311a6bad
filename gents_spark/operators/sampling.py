"""Deterministic sampling, train/test splitting, and cross-split
n-gram contamination detection for training-data pipelines.

Three ops a 100 TB corpus pipeline runs constantly:

- **stratified_sample**: keep a fixed fraction of every stratum with a
  content-addressed rule — ``md5(key) mod`` — so the sample is (a)
  reproducible across runs/engines with no RNG state, (b) consistent:
  the same key is always in or always out, so joins between sampled
  tables stay aligned, and (c) a pure map-side filter: NO shuffle, no
  sort, pushes through any scan.  This is the public salted-hash
  sampling idiom (same family as Spark's ``sampleBy`` but
  deterministic in the KEY, not the row position).

- **split_train_test**: the same md5 rule as a boolean column — the
  canonical held-out split that survives re-partitioning and appends.

- **ngram_contamination**: which TEST documents share word n-grams with
  which TRAIN documents (benchmark-leakage audit).  Same two-phase
  frequency-capped inverted-index shape as
  ``dedup.ngram_jaccard_pairs`` (dedup.py:82): candidates only from
  shingles with document frequency <= cap (hot boilerplate shingles
  never form pairs — the AllPairs/PPJoin bound on join fan-out), then
  the shared-shingle count verifies EXACTLY over the candidates' full
  shingle sets.  Every join is an equi-join on the shingle; nothing is
  all-pairs at any scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: md5 prefix width: 8 hex chars = 32 bits, uniform on [0, 2^32)
_MOD = 1 << 32


def hash_frac(key: F.Column) -> F.Column:
    """Uniform [0, 1) deterministic hash of a key column (md5-based so
    SQL oracles reproduce it bit-for-bit: DuckDB
    ``('0x' || substring(md5(x), 1, 8))::BIGINT``)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return h.cast("bigint") / F.lit(float(_MOD))


def stratified_sample(
    df: DataFrame, key: str, frac: float, strata: str | None = None
) -> DataFrame:
    """Keep rows with hash_frac(key) < frac — per-stratum when the rule
    key embeds the stratum (pass ``strata`` to salt the hash with the
    stratum so small strata draw independently).  Map-side only."""
    k = F.col(key)
    if strata is not None:
        k = F.concat_ws("|", F.col(strata), F.col(key).cast("string"))
    return df.filter(hash_frac(k) < F.lit(frac))


def split_train_test(
    df: DataFrame, key: str, test_frac: float = 0.1
) -> DataFrame:
    """Add ``is_test``: deterministic md5 held-out split on ``key``."""
    return df.withColumn(
        "is_test", hash_frac(F.col(key)) < F.lit(test_frac)
    )


def ngram_contamination(
    docs: DataFrame,
    n: int = 5,
    test_frac: float = 0.2,
    max_shingle_df: int | None = 50,
    min_shared: int = 1,
    cache_handles: list | None = None,
) -> DataFrame:
    """(test_doc_id, train_doc_id, n_shared) for every cross-split pair
    sharing >= ``min_shared`` distinct word n-grams.

    Candidates come from the frequency-capped inverted index (df <=
    ``max_shingle_df``); ``n_shared`` then counts ALL common shingles
    of each candidate pair exactly, so values are cap-independent —
    only pairs whose every overlap is hotter than the cap are missed.

    ``cache_handles``: pass a list to receive the persisted
    intermediate DataFrames; a long-lived session should
    ``h.unpersist()`` each after consuming the result (round-3 ADVICE —
    otherwise reclamation waits for the ContextCleaner GC hook).
    """
    from gents_spark.operators.dedup import shingles_col
    from gents_spark.operators.textstats import word_hash

    split = split_train_test(docs, "doc_id", test_frac)
    # shingles join/aggregate as 60-bit md5 keys, not ~30-char strings:
    # the inverted index and both verify joins shuffle on this column,
    # so narrowing it cuts most of the operator's shuffle bytes.  The
    # hash is the engine-portable md5 prefix (same expression in the
    # DuckDB oracle), so cross-engine counts stay bit-identical even in
    # the astronomically-unlikely collision case — both engines collide
    # identically.
    # per-doc distinct via array_distinct BEFORE the explode: map-side
    # set semantics (doc_id unique, is_test functionally dependent on
    # it) — a post-explode .distinct() would shuffle the entire
    # exploded index once more for nothing (r05)
    hashed = F.array_distinct(F.transform(shingles_col(n), word_hash))
    sh = split.select(
        "doc_id", "is_test", F.explode(hashed).alias("shingle")
    )
    # the shingle index feeds FOUR consumers (df counts, capped
    # candidates, and both exact-verify sides); without a persist Spark
    # re-explodes and re-distincts the corpus four times.  MEMORY_AND_DISK:
    # the index is |docs| x shingles rows — at 100 TB this is the
    # materialized inverted index every industrial near-dup pipeline
    # builds once and reuses.  Unpersist is left to the ContextCleaner
    # (the returned DataFrame is lazy; callers hold no handle).
    from pyspark import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    if cache_handles is not None:
        cache_handles.append(sh)
    cand_src = sh
    if max_shingle_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        cand_src = (
            sh.join(dfreq, "shingle")
            .filter(F.col("_df") <= max_shingle_df)
            .select("doc_id", "is_test", "shingle")
        )
    test_sh = cand_src.filter(F.col("is_test")).select(
        F.col("doc_id").alias("test_doc_id"), "shingle"
    )
    train_sh = cand_src.filter(~F.col("is_test")).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    cand = (
        test_sh.join(train_sh, "shingle")
        .select("test_doc_id", "train_doc_id")
        .distinct()
    )
    # exact verify over FULL shingle sets (uncapped)
    full_test = sh.filter(F.col("is_test")).select(
        F.col("doc_id").alias("test_doc_id"), "shingle"
    )
    full_train = sh.filter(~F.col("is_test")).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    return (
        cand.join(full_test, "test_doc_id")
        .join(full_train, ["train_doc_id", "shingle"])
        .groupBy("test_doc_id", "train_doc_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    strata: str = "source",
    default_frac: float = 0.0,
) -> DataFrame:
    """Data-mixing sampler: keep a PER-STRATUM fraction of rows
    (e.g. {"web": 0.1, "books": 1.0}) with the same content-addressed
    md5 rule as ``stratified_sample`` — the standard corpus-mixture
    step that up/down-weights sources before training.

    Strata absent from ``weights`` keep ``default_frac`` (0 = dropped).
    The hash is salted with the stratum, so a key drawn at 10% in one
    stratum is an independent draw in another.  Pure map-side filter:
    the per-stratum threshold joins the row via a CASE expression, not
    a table — zero shuffle at any corpus size; reproducible across
    runs, engines, and repartitioning.
    """
    for s, f in weights.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"weight for {s!r} must be in [0, 1], got {f}")
    thr = F.lit(float(default_frac))
    for s, f in sorted(weights.items()):
        thr = F.when(F.col(strata) == s, F.lit(float(f))).otherwise(thr)
    salted = F.concat_ws("|", F.col(strata), F.col(key).cast("string"))
    return df.filter(hash_frac(salted) < thr)
