"""Vocabulary-over-time operators for training-corpus monitoring.

The time axis turns the static text screens (``textstats``) into the
dataset-health timeseries an LLM-data pipeline actually watches: is the
vocabulary still growing (crawl finding new content) or suddenly
exploding (spam/encoding corruption)?  Did a source's token
distribution shift overnight (``anomaly.categorical_drift``)?  How
diverse is each document's token stream (entropy — degenerate
low-entropy docs are dropped before training)?

All operators are JVM column expressions / single-shuffle wordcount
shapes — no Python in any hot path — and every float is produced by a
deterministic left-to-right fold or a single final division, so each
pairs with a bitwise DuckDB oracle (the repo's proven recipe:
exact integers + identical expression shape + ordered folds).

Reference analog: GenTS tracks per-variable presence over file time
slices (``gents/hfcollection.py:311-359`` variable-set fingerprints);
a token vocabulary is the same census with a ~10^6x larger alphabet,
so the operators here are aggregation-first (never collect a vocab).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def vocab_growth(
    toks: DataFrame,
    key: str = "source",
    day: str = "day",
    term: str = "term",
) -> DataFrame:
    """Vocabulary growth curve per key: for every day, how many token
    TYPES appeared for the first time (``new_terms``) and the running
    vocabulary size (``vocab_size``).

    A healthy crawl's curve follows Heaps' law (sublinear growth); a
    spam flood or encoding corruption shows as a step.

    Scale shape: one wordcount-style shuffle to (key, term) -> min(day)
    — map-side partial min combines before the exchange, so the
    exchange carries |vocab| rows, not |tokens| — then a count groupBy
    and a running-sum window over the tiny (keys x days) table.  The
    first-seen census never materializes the vocabulary anywhere.
    """
    first = toks.groupBy(key, term).agg(F.min(day).alias(day))
    news = first.groupBy(key, day).agg(
        F.count("*").alias("new_terms")
    )
    w = (
        Window.partitionBy(key)
        .orderBy(day)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return news.select(
        key,
        day,
        "new_terms",
        F.sum("new_terms").over(w).alias("vocab_size"),
    )


def token_entropy(
    docs: DataFrame,
    text: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the whitespace-token
    distribution: H = ln(n) - (1/n) * sum(c * ln c) over per-type
    counts c.  Low entropy = repetitive/degenerate text (the
    information-theoretic sibling of ``textstats.repetition_stats``'
    dup-word fraction); H = 0 for a one-token-type doc.

    ENTIRELY map-side — no explode, no shuffle: the token array is
    sorted in place, run lengths come from the sorted array's boundary
    indices (pure array expressions), and the entropy sum is a
    LEFT-TO-RIGHT ``F.aggregate`` fold over runs in sorted-token order,
    which a DuckDB ``list(c ORDER BY term)`` fold replays in the same
    order bit-for-bit (to the 6dp rounding; single-ulp ln() differences
    across libm implementations sit ~1e-14 below it).

    PERFORMANCE SHAPE (measured, 49x): higher-order-function lambdas
    re-evaluate any OUTER expression they reference once per element —
    Catalyst does no common-subexpression elimination across a lambda
    boundary, so ``element_at(array_sort(...), i)`` inside the boundary
    filter re-sorts the document per token (O(n^2 log n); 34.6s for
    sf0.1's 5k docs).  Wrapping the whole computation in
    ``transform(array(sorted), arr -> ...)`` binds the sorted array to
    a lambda VARIABLE, which is evaluated once and then only referenced
    — same plan shape, 0.7s.

    Output: (doc_id, n_words, n_types, entropy).
    """

    def _body(arr: F.Column) -> F.Column:
        n = F.size(arr)
        # 0-based start index of every run in the sorted token array
        starts = F.filter(
            F.sequence(F.lit(0), n - 1),
            lambda i: (i == F.lit(0))
            | (F.element_at(arr, i + 1) != F.element_at(arr, i)),
        )
        n_types = F.size(starts)
        # each run ends where the next begins; the last run ends at n
        ends = F.concat(F.slice(starts, 2, n_types - 1), F.array(n))
        runs = F.zip_with(starts, ends, lambda a, b: b - a)
        acc = F.aggregate(
            runs,
            F.lit(0.0),
            lambda a, c: a + c.cast("double") * F.log(c.cast("double")),
        )
        entropy = F.round(
            F.log(n.cast("double")) - acc / n.cast("double"), 6
        )
        return F.struct(
            n.alias("n_words"),
            n_types.alias("n_types"),
            entropy.alias("entropy"),
        )

    from gents_spark.operators.textstats import words_col

    sorted_toks = F.array_sort(words_col(text))
    st = F.element_at(F.transform(F.array(sorted_toks), _body), 1)
    return docs.select(doc_id, st.alias("_e")).select(
        doc_id, "_e.n_words", "_e.n_types", "_e.entropy"
    )


def topk_terms_per_bucket(
    toks: DataFrame,
    key: str = "source",
    day: str = "day",
    term: str = "term",
    k: int = 3,
) -> DataFrame:
    """Top-k tokens per (key, day) with deterministic rank (count desc,
    term asc) — the daily head-of-distribution leaderboard; a head
    takeover (one term jumping to rank 1 everywhere) is the classic
    boilerplate-injection signature.

    Scale shape: the raw token stream collapses to (key, day, term)
    counts in one map-side-combined shuffle; the row_number window then
    sorts only the AGGREGATED vocabulary of each (key, day) group —
    bounded by |vocab|, never by |tokens|.  (Same plan family as
    ``leaderboard.rank_shift``, which windows hourly user counts.)
    """
    if k < 1:
        raise ValueError(f"k={k}: expected >= 1")
    counts = toks.groupBy(key, day, term).agg(
        F.count("*").alias("tf")
    )
    w = Window.partitionBy(key, day).orderBy(
        F.desc("tf"), F.asc(term)
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(key, day, "rank", term, "tf")
    )


def collocation_lift(
    docs: DataFrame,
    text: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Corpus-level bigram collocation census with association LIFT —
    the phrase-mining primitive (word2vec/Mikolov-style phrase joining,
    Dunning contingency tables) a training pipeline runs before
    deciding which token pairs to glue: lift >> 1 = the pair co-occurs
    far above chance ("new york"), lift ~ 1 = incidental adjacency.
    ``repetition_stats`` censuses bigrams WITHIN one doc; this is the
    cross-corpus view.

    Definitions, all from the ONE adjacent-pair table: ``n_pair`` =
    count of the ordered pair, ``n_left`` = count of ``w1`` as a
    bigram's first word, ``n_right`` = count of ``w2`` as second,
    ``n_total`` = all bigram occurrences in the corpus, and

        lift = (n_total * n_pair) / (n_left * n_right)

    (PMI = ln(lift); lift is emitted instead of the log so the only
    float work is one mul/mul/div chain in doubles — overflow-safe at
    any corpus size and mirrored shape-for-shape by the oracle twin.)
    Counts are exact bigints; rows with ``n_pair < min_count`` are
    dropped AFTER the marginals are computed, so the filter never
    biases the statistics.

    Scale shape: pair extraction is a map-side zip_with over each doc's
    word array (one explode, no join back to docs); the census is one
    map-side-combined groupBy on (w1, w2); the two marginals are
    unordered aggregate windows over the DISTINCT-bigram table (each
    partition bounded by |vocab|, never by |tokens|); the corpus total
    is a broadcast one-row crossJoin.  Nothing materializes a
    vocabulary on the driver.
    """
    if min_count < 1:
        raise ValueError(f"min_count={min_count}: expected >= 1")
    from gents_spark.operators.textstats import words_col

    ws = words_col(text)
    n = F.size(ws)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = docs.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )
    cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    cnt = cnt.withColumn(
        "n_left", F.sum("n_pair").over(Window.partitionBy("w1"))
    ).withColumn(
        "n_right", F.sum("n_pair").over(Window.partitionBy("w2"))
    )
    total = cnt.agg(F.sum("n_pair").alias("n_total"))
    lift = F.round(
        (F.col("n_total").cast("double") * F.col("n_pair").cast("double"))
        / (
            F.col("n_left").cast("double")
            * F.col("n_right").cast("double")
        ),
        6,
    )
    return (
        cnt.crossJoin(F.broadcast(total))
        .filter(F.col("n_pair") >= F.lit(min_count))
        .select(
            "w1", "w2", "n_pair", "n_left", "n_right",
            "n_total", lift.alias("lift"),
        )
    )


def token_coverage(
    toks: DataFrame,
    key: str = "source",
    term: str = "term",
    k: int = 100,
) -> DataFrame:
    """Head-coverage census: what fraction of all token OCCURRENCES the
    top-``k`` token TYPES carry, per key — the tokenizer/vocab-sizing
    question ("how big a vocabulary covers 95% of this source?") and a
    concentration screen (coverage jumping toward 1.0 = the source
    collapsed onto boilerplate; ``topk_terms_per_bucket`` then names
    the offenders).

    Output: (key, k_types, n_types, n_tokens, covered_tokens,
    coverage) — all exact bigints except the one final division.

    Scale shape: the raw stream collapses to (key, term) counts in one
    map-side-combined shuffle; the rank window and the final aggregate
    run over the AGGREGATED vocabulary (bounded by |vocab| per key,
    never |tokens|) — the same accepted contract as
    ``topk_terms_per_bucket``.
    """
    if k < 1:
        raise ValueError(f"k={k}: expected >= 1")
    counts = toks.groupBy(key, term).agg(F.count("*").alias("tf"))
    w = Window.partitionBy(key).orderBy(F.desc("tf"), F.asc(term))
    r = counts.withColumn("rank", F.row_number().over(w))
    out = r.groupBy(key).agg(
        F.count("*").alias("n_types"),
        F.sum("tf").alias("n_tokens"),
        F.sum(
            F.when(F.col("rank") <= k, F.col("tf")).otherwise(F.lit(0))
        ).alias("covered_tokens"),
    )
    return out.select(
        key,
        F.lit(k).alias("k_types"),
        "n_types",
        "n_tokens",
        "covered_tokens",
        F.round(
            F.col("covered_tokens").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("coverage"),
    )


def zipf_fit(
    toks: DataFrame,
    key: str = "source",
    term: str = "term",
    max_rank: int = 200,
) -> DataFrame:
    """Zipf power-law fit per key: OLS slope of ln(tf) on ln(rank)
    over the top-``max_rank`` ranked token types — natural text sits
    near slope -1 (Zipf 1949); a much flatter slope flags synthetic/
    uniform token streams, a much steeper one flags boilerplate
    collapse.  The vocabulary-shape sibling of ``anomaly.trend_slope``
    (OLS over time) and ``token_entropy`` (per-doc diversity).

    Determinism (the repo's ordered-fold recipe, proven by
    ``token_entropy``): the per-key (rank, tf) head is gathered into a
    rank-sorted array — bounded at ``max_rank`` elements, the
    ``theil_sen_slope`` bounded-gather contract — and each OLS moment
    (Sx, Sy, Sxx, Sxy) is a LEFT-TO-RIGHT ``F.aggregate`` fold in rank
    order, which the DuckDB twin replays with ``list(... ORDER BY
    rank)`` + ``list_reduce`` bit-for-bit.  The slope/intercept chain
    is a fixed shape over those four identical doubles.

    Output: (key, n_ranks, zipf_slope, zipf_intercept) — slope NULL
    when fewer than 2 ranks or a degenerate (all-equal-rank) head.
    """
    if max_rank < 1:
        raise ValueError(f"max_rank={max_rank}: expected >= 1")
    counts = toks.groupBy(key, term).agg(F.count("*").alias("tf"))
    w = Window.partitionBy(key).orderBy(F.desc("tf"), F.asc(term))
    head = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= max_rank
    )
    g = head.groupBy(key).agg(
        F.sort_array(
            F.collect_list(F.struct("rank", "tf"))
        ).alias("_h")
    )

    def _fold(arr: F.Column, f) -> F.Column:
        return F.aggregate(arr, F.lit(0.0), lambda a, e: a + f(e))

    def _body(arr: F.Column) -> F.Column:
        lnr = lambda e: F.log(e["rank"].cast("double"))  # noqa: E731
        lnt = lambda e: F.log(e["tf"].cast("double"))  # noqa: E731
        n = F.size(arr).cast("double")
        sx = _fold(arr, lnr)
        sy = _fold(arr, lnt)
        sxx = _fold(arr, lambda e: lnr(e) * lnr(e))
        sxy = _fold(arr, lambda e: lnr(e) * lnt(e))
        den = n * sxx - sx * sx
        slope = F.when(
            (F.size(arr) >= 2) & (den != F.lit(0.0)),
            (n * sxy - sx * sy) / den,
        )
        intercept = (sy - ((n * sxy - sx * sy) / den) * sx) / n
        return F.struct(
            F.size(arr).alias("n_ranks"),
            F.round(slope, 6).alias("zipf_slope"),
            F.when(slope.isNotNull(), F.round(intercept, 6)).alias(
                "zipf_intercept"
            ),
        )

    st = F.element_at(F.transform(F.array(F.col("_h")), _body), 1)
    return g.select(key, st.alias("_z")).select(
        key, "_z.n_ranks", "_z.zipf_slope", "_z.zipf_intercept"
    )
