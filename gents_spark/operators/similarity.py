"""Similarity search over embedding columns (array<float>).

Two paths per the training-data-pipeline requirement:

- brute-force cosine top-k: the exactness baseline.  Quantized to
  integer arithmetic (floor(e*1000)) so dot products and norms are
  EXACT and order-independent — bitwise-reproducible across engines and
  partitionings (float accumulation order would not be).
- LSH-bucketed: sign-bit buckets on leading dimensions (axis-aligned
  random-hyperplane LSH); candidate pairs only form inside a bucket —
  the join is on the bucket key, never an all-pairs product.  This is
  the 100 TB path: bucket count scales the candidate set down
  quadratically.

All expressions are JVM-side (``transform``/``aggregate``/``zip_with``);
no Python in the data path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

Q = 1000  # quantization steps per unit


def quantized(col: str = "embedding") -> F.Column:
    return F.transform(
        F.col(col), lambda e: F.floor(e.cast("double") * Q).cast("long")
    )


def _sq_norm(qcol: F.Column) -> F.Column:
    return F.aggregate(
        qcol, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def with_quantized(emb: DataFrame) -> DataFrame:
    q = quantized()
    return emb.select(
        "vec_id", "label", q.alias("q"), _sq_norm(q).alias("n2")
    ).filter(F.col("n2") > 0)


def cosine_topk(
    emb: DataFrame, k: int = 5, n_queries: int = 20
) -> DataFrame:
    """Brute-force top-k neighbors for the first ``n_queries`` vectors.

    Output: (query_id, neighbor_id, rank, cos).  The query side is tiny
    and broadcast; the big side streams — at scale this is the classic
    broadcast-NN scan (one pass over the corpus per query batch).
    """
    base = with_quantized(emb)
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qa"),
        F.col("n2").alias("na"),
    )
    corpus = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("qb"),
        F.col("n2").alias("nb"),
    )
    pairs = F.broadcast(queries).crossJoin(corpus).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.withColumn(
        "cos_raw",
        _dot(F.col("qa"), F.col("qb"))
        / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("cos_raw", 6).alias("cos")
        )
    )


def sign_bucket(col: str = "embedding", bits: int = 8) -> F.Column:
    """Axis-aligned hyperplane LSH key: sign pattern of leading dims."""
    return F.concat(
        *[
            F.when(F.element_at(F.col(col), i + 1) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(bits)
        ]
    )


def lsh_bucket_pairs(emb: DataFrame, bits: int = 8) -> DataFrame:
    """Most-similar pair per LSH bucket (buckets with >=2 members).

    Output: (bucket, n_members, doc_a, doc_b, cos).
    """
    # bucket comes from raw embedding signs; quantized cols join back on id
    raw = emb.select("vec_id", sign_bucket(bits=bits).alias("bucket"))
    base = with_quantized(emb).join(raw, "vec_id")
    sizes = base.groupBy("bucket").agg(F.count("*").alias("n_members"))
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.bucket").alias("bucket"),
        F.col("a.vec_id").alias("doc_a"),
        F.col("b.vec_id").alias("doc_b"),
        (
            _dot(F.col("a.q"), F.col("b.q"))
            / F.sqrt((F.col("a.n2") * F.col("b.n2")).cast("double"))
        ).alias("cos_raw"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.desc("cos_raw"), F.asc("doc_a"), F.asc("doc_b")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(sizes, "bucket")
        .select(
            "bucket", "n_members", "doc_a", "doc_b",
            F.round("cos_raw", 6).alias("cos"),
        )
    )


def embedding_near_dup_docs(
    docs: DataFrame, emb: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-duplicate detection over documents:
    join docs to their embedding vectors (doc_id == vec_id), emit doc
    pairs whose quantized cosine >= threshold.

    Scale path: at corpus scale this candidate set comes from the LSH
    buckets (``lsh_bucket_pairs``) instead of the all-pairs product;
    exact cosine then verifies candidates — the same two-stage shape as
    MinHash->Jaccard in dedup.py.
    """
    base = with_quantized(emb).join(
        docs.select(F.col("doc_id").alias("vec_id"), "source"), "vec_id"
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("doc_a"),
        F.col("b.vec_id").alias("doc_b"),
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        (
            _dot(F.col("a.q"), F.col("b.q"))
            / F.sqrt((F.col("a.n2") * F.col("b.n2")).cast("double"))
        ).alias("cos_raw"),
    )
    return pairs.filter(F.col("cos_raw") >= threshold).select(
        "doc_a", "doc_b", "source_a", "source_b",
        F.round("cos_raw", 6).alias("cos"),
    )


def label_stats(emb: DataFrame) -> DataFrame:
    """Per-label corpus stats on quantized norms (exact integers until
    the final rounded average)."""
    base = with_quantized(emb)
    return base.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.sum("n2").alias("sum_sq_norm"),
        F.round(F.avg(F.sqrt(F.col("n2").cast("double"))), 6).alias("avg_norm"),
    )
