"""Text-analysis operators for training-data pipelines.

All JVM-side column expressions (split / regexp / aggregate folds) — no
Python UDFs — so they run inside whole-stage codegen and pair 1:1 with
ANSI-SQL oracles.

Word hashing uses the first 15 hex chars of md5 as a bigint (60 bits,
overflow-safe) — reproducible in any engine, unlike engine-native hash().
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: deterministic 60-bit word hash (portable across engines)
def word_hash(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


MOD_P = 1_000_000_007

#: synthetic lexicons: word -> class via md5 % 5 (the container has no
#: real language corpora; the *mechanism* — lexicon scoring + argmax —
#: is the operator under test)
LANGS = ["de", "en", "es", "fr", "zh"]

STOPWORDS = ["the", "a", "of", "and", "in", "value", "data", "row"]

BPE_ISH_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


def words_col(text: str = "text") -> F.Column:
    return F.split(F.col(text), " ")


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (SURVEY task:
    token counting for training-data budgeting)."""
    return docs.select(
        "doc_id",
        F.size(words_col()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length("text").alias("n_chars_seen"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / stopword-ratio quality heuristic; pure arithmetic so the
    score is bitwise-reproducible."""
    w = words_col()
    n_words = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    stop_ratio = F.round(n_stop.cast("double") / n_words, 6)
    mean_wlen = F.round(
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / n_words,
        6,
    )
    quality = F.round(
        F.least(n_words, F.lit(100)).cast("double")
        / 100.0
        * (F.lit(1.0) - n_stop.cast("double") / n_words),
        6,
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_stop.alias("n_stop"),
        stop_ratio.alias("stop_ratio"),
        mean_wlen.alias("mean_word_len"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Lexicon-scoring language ID: each word votes for the class its
    hash falls in; argmax with deterministic tie-break."""
    exploded = docs.select(
        "doc_id", F.explode(words_col()).alias("w")
    ).withColumn("cls", F.pmod(word_hash(F.col("w")), F.lit(5)).cast("int"))
    counted = exploded.groupBy("doc_id", "cls").agg(F.count("*").alias("votes"))
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(F.desc("votes"), F.asc("cls"))
    best = (
        counted.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cls", "votes")
    )
    lang_map = F.array(*[F.lit(x) for x in LANGS])
    return best.select(
        "doc_id",
        F.element_at(lang_map, F.col("cls") + 1).alias("pred_lang"),
        "votes",
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Order-sensitive rolling hash over the word stream
    (h = (h*31 + word_hash) mod p) — document fingerprinting for
    near-identity checks; a deterministic fold, no UDF."""
    hashed = F.transform(words_col(), lambda x: F.pmod(word_hash(x), F.lit(MOD_P)))
    fp = F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * 31 + x, F.lit(MOD_P)),
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1 repetition filters — duplicate-word fraction and
    top-n-gram mass are the published proxies for degenerate/boilerplate
    text that training pipelines drop).

    Output: (doc_id, n_words, n_distinct_words, dup_word_frac,
    top_bigram, top_bigram_n, top_bigram_frac).  Fractions are single
    IEEE divisions of exact integers (engine-deterministic); the top
    bigram tie-break is lexicographic-min among max-count bigrams via a
    struct-min aggregate (no window).

    Scale shape: ENTIRELY map-side — word stats via ``size`` /
    ``array_distinct``, and the bigram top-1 via a run-length fold over
    the doc's SORTED bigram array (equal bigrams are adjacent after
    ``array_sort``, so the longest run is the max count, and scanning
    ascending with strictly-greater replacement keeps the
    lexicographically-smallest bigram among ties).  Zero shuffle, zero
    join: per-doc text stats never need rows to meet other rows, so at
    100 TB this runs as a pure scan-project.  Docs under 2 words get
    NULL bigram columns.
    """
    from gents_spark.operators.dedup import shingles_col

    w = words_col()
    sorted_bg = F.array_sort(shingles_col(2))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(None).cast("string").alias("bestbg"),
    )

    def step(acc, x):
        run_new = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        better = run_new > acc.best
        return F.struct(
            x.alias("prev"),
            run_new.alias("run"),
            F.when(better, run_new).otherwise(acc.best).alias("best"),
            F.when(better, x).otherwise(acc.bestbg).alias("bestbg"),
        )

    top = F.aggregate(sorted_bg, init, step)
    stats = docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct_words"),
        F.size(sorted_bg).alias("_nbg"),
        top["best"].alias("_best"),
        top["bestbg"].alias("_bestbg"),
    )
    nw, nd = F.col("n_words"), F.col("n_distinct_words")
    has_bg = F.col("_nbg") > 0
    return stats.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        F.round((nw - nd) / nw, 6).alias("dup_word_frac"),
        F.when(has_bg, F.col("_bestbg")).alias("top_bigram"),
        F.when(has_bg, F.col("_best")).alias("top_bigram_n"),
        F.when(
            has_bg, F.round(F.col("_best") / F.col("_nbg"), 6)
        ).alias("top_bigram_frac"),
    )


#: PII patterns written in the common subset of Java regex (Spark) and
#: RE2 (DuckDB oracle): no lookaround, no backrefs — so the engine and
#: the oracle compile the IDENTICAL pattern.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
}


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact common PII (emails, IPv4, US-style phone numbers) and
    count matches per class — the scrub every training-data pipeline
    runs before text reaches a tokenizer.

    Output: (doc_id, n_email, n_ipv4, n_phone, text_clean).  Counts are
    taken on the ORIGINAL text per class (order-independent); redaction
    applies email -> ipv4 -> phone so an earlier placeholder can't be
    re-matched (patterns are digit/alnum-anchored; placeholders are
    not).  Pure map-side ``regexp_count``/``regexp_replace`` column
    expressions — whole-stage codegen, zero shuffle, embarrassingly
    parallel at any scale.
    """
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).alias(f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    ]
    clean = t
    for _name, (pat, repl) in PII_PATTERNS.items():
        clean = F.regexp_replace(clean, pat, repl)
    return docs.select("doc_id", *counts, clean.alias("text_clean"))


def quality_filter(
    docs: DataFrame,
    min_words: int = 30,
    max_words: int = 100_000,
    max_dup_word_frac: float = 0.6,
    max_top_bigram_frac: float = 0.2,
) -> DataFrame:
    """Gopher-rule document filter: compose the repetition signals into
    a keep/drop verdict with explicit drop reasons (the shape of Rae et
    al. 2021 §A1.1's quality pipeline — documents are dropped for a
    NAMED rule, so corpus curation is auditable).

    Output: (doc_id, n_words, dup_word_frac, top_bigram_frac,
    drop_reasons array<string>, keep boolean).  Thresholds compare the
    ROUNDED fractions the stats operator emits, so verdicts are
    engine-deterministic at the 6dp boundary.  Same scale shape as
    ``repetition_stats`` plus a map-side projection.
    """
    r = repetition_stats(docs)
    reasons = F.array_compact(
        F.array(
            F.when(F.col("n_words") < min_words, F.lit("too_short")),
            F.when(F.col("n_words") > max_words, F.lit("too_long")),
            F.when(
                F.col("dup_word_frac") > max_dup_word_frac,
                F.lit("dup_words"),
            ),
            F.when(
                F.col("top_bigram_frac") > max_top_bigram_frac,
                F.lit("rep_bigram"),
            ),
        )
    )
    return r.select(
        "doc_id",
        "n_words",
        "dup_word_frac",
        "top_bigram_frac",
        reasons.alias("drop_reasons"),
        (F.size(reasons) == 0).alias("keep"),
    )


def length_histogram(
    docs: DataFrame,
    key: str = "source",
    text: str = "text",
) -> DataFrame:
    """Log2-bucketed document-length census per key — the
    sequence-length distribution a packing/curation pipeline plans
    against (``packing.pack_tokens``' token budget, truncation-loss
    estimates, batch-shape tuning): bucket b holds docs with
    ``2^b <= n_words < 2^(b+1)`` (b = 0 for single-word docs, -1 for
    empty).  Log buckets keep the table tiny (~40 rows per key covers
    any length) while exposing exactly the head/tail shape uniform
    bins blur.

    All-integer except the one final share division; ``floor(log2(n))``
    is computed by BIT LENGTH (63 - number of leading zeros via a
    comparison ladder is unnecessary — ``bit_length(n) - 1`` is exact
    integer arithmetic in both engines, where a floating ``log2`` can
    land on the wrong side of a power of two).  One map-side projection
    + one map-side-combined groupBy; no window, no UDF.

    Output: (key, bucket, lo_words, n_docs, share) — ``lo_words`` =
    2^bucket, the bucket's inclusive lower edge (0 for the empty
    bucket); share = bucket fraction of the key's docs.
    """
    from pyspark.sql import Window

    n = F.coalesce(F.size(words_col(text)), F.lit(0))
    # length of the base-2 string == bit length == floor(log2(n)) + 1
    # for n >= 1 — exact integer arithmetic where a floating log2 can
    # land on the wrong side of a power of two
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        F.length(F.conv(n.cast("string"), 10, 2)).cast("int") - 1
    )
    d = docs.select(F.col(key), bucket.alias("bucket"))
    g = d.groupBy(key, "bucket").agg(F.count("*").alias("n_docs"))
    tot = F.sum("n_docs").over(Window.partitionBy(key))
    return g.select(
        key,
        "bucket",
        F.when(F.col("bucket") < 0, F.lit(0))
        .otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
        .cast("bigint")
        .alias("lo_words"),
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / tot.cast("double"), 6
        ).alias("share"),
    )
