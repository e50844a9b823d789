"""Span-level exact-substring deduplication — the ExactSubstr family
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"): document-level dedup (ops/dedup.py) misses the pervasive case
where two mostly-different documents share one long verbatim passage (a
quoted article, a license block, a template paragraph). This operator
finds, for every document, the maximal token spans of length >= min_len
whose text also appears verbatim in ANOTHER document, so a training
pipeline can cut the repeated passage and keep the unique remainder.

Method — the Spark-shaped reduction of the suffix-array approach: a span
of length L >= min_len is repeated iff every min_len-token window inside
it is repeated, so it suffices to (1) explode each document's rolling
min_len-token windows with their positions, (2) keep windows whose text
occurs in >= 2 documents (or >= dup_count times overall, catching
within-document repeats when self_match=True), and (3) merge overlapping
/ adjacent duplicated windows per document into maximal spans — which is
exactly the gap-sessionization window pattern (a new span starts when
the next duplicated window's position jumps by more than one... i.e.
> window start + 1): lag + running-sum over one (doc)-keyed window.

Cost shape at 100 TB: one in-row window build (codegen HOFs over the
materialized word array — the word_ngrams PERFORMANCE CONTRACT), one
count keyed on a 64-bit xxhash of the window text (map-side combinable;
Zipf-headed boilerplate windows absorbed by partial aggregation exactly
like word count), one semi-join back, one doc-keyed sort for the merge.
No pair of documents is ever joined — repetition is detected through
the count table, so the cost is linear in corpus tokens, not quadratic
in documents (the property that makes ExactSubstr viable at scale).

Hash note: windows join on xxhash64(text) for fixed-width shuffle keys;
a collision could mark a unique span as duplicated (never the reverse).
At 64 bits the corpus needs ~5e9 DISTINCT windows for a 50% chance of
one collision anywhere; flagged spans feeding a DESTRUCTIVE cut can be
re-verified exactly by one equi-join on the span text.

Reference anchor: no analogue in hexhamming; training-data surface per
the round brief. Composes with pipeline/corpus.CorpusRunner upstream of
exact dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hexspark.ops.quality import words_array


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    dup_count: int = 2,
    self_match: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns (id, span_start, span_end, span_tokens): token positions are
    0-based, span_end exclusive, span_tokens = span_end - span_start >=
    min_len. A document with no duplicated window emits nothing.

    ``self_match=False`` (default) requires a window to appear in >= 2
    DISTINCT documents (cross-document contamination); ``self_match=True``
    counts total occurrences, also catching a passage repeated inside one
    document (intra-doc boilerplate — the repetition_stats signal, but
    localized to positions).
    """
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2 (got {min_len})")
    if dup_count < 2:
        raise ValueError(f"dup_count must be >= 2 (got {dup_count})")
    base = docs.select(
        F.col(id_col).alias("_id"), words_array(F.col(text_col)).alias("_ws")
    )
    size = F.size("_ws")
    idx = F.sequence(F.lit(0), size - min_len)
    windows = base.select(
        "_id",
        F.posexplode(
            F.when(
                size >= min_len,
                F.transform(
                    idx,
                    lambda i: F.xxhash64(
                        F.concat_ws(
                            " ",
                            F.slice(F.col("_ws"), i + 1, min_len),
                        )
                    ),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("pos", "h"),
    )
    counts = windows.groupBy("h").agg(
        (
            F.count_distinct("_id") if not self_match else F.count(F.lit(1))
        ).alias("occ")
    )
    dup = windows.join(
        counts.where(F.col("occ") >= dup_count).select("h"), "h", "left_semi"
    )
    # merge overlapping/adjacent duplicated windows into maximal disjoint
    # spans (the event_sessions lag + running-sum device, keyed on doc):
    # two L-token windows at positions p < q cover contiguous text iff
    # q - p <= L, so a position gap > min_len starts a new span; every
    # token inside a span lies in at least one duplicated window
    w = Window.partitionBy("_id").orderBy("pos")
    runs = (
        dup.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (F.col("pos") - F.col("_prev") > min_len),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_run",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return runs.groupBy("_id", "_run").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + min_len).alias("span_end"),
    ).select(
        F.col("_id").alias(id_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
    )


def span_dedup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    dup_count: int = 2,
    self_match: bool = False,
) -> DataFrame:
    """Per-document rollup of duplicated_spans joined back to size:
    (id, n_tokens, n_spans, dup_tokens, dup_frac). Every input document
    appears exactly once (zero rows for clean docs become zeros) — the
    keep/cut decision table."""
    spans = duplicated_spans(docs, id_col, text_col, min_len, dup_count, self_match)
    agg = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    sizes = docs.select(
        F.col(id_col),
        F.size(words_array(F.col(text_col))).alias("n_tokens"),
    )
    return sizes.join(agg, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.coalesce("dup_tokens", F.lit(0)).cast("double") / F.col("n_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )
