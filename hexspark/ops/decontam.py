"""Benchmark decontamination — cross-corpus n-gram overlap detection, the
train/test hygiene pass every LLM data pipeline runs before shipping a
corpus (GPT-3 App. C / Llama-style 8-to-13-word-gram matching): flag any
training document that shares a long verbatim word n-gram with an
evaluation set, so benchmark answers don't leak into the training data.

Shape and scale:

* Both corpora normalize through ONE shared definition
  (ops/quality.words_array — lowercased [a-z0-9]+ runs) and build their
  word n-grams IN-ROW with codegen higher-order functions; nothing here
  is Python.
* The evaluation side is benchmark-sized (thousands of documents, not
  terabytes), so its distinct n-gram set BROADCASTS — the 100-TB train
  scan pays one explode + one broadcast semi-join and zero shuffle of
  training content. The only exchange is the per-train-doc count
  aggregate, keyed on doc_id.
* The join key is the n-gram STRING itself (exact — no hash-collision
  false positives; Spark hashes internally for the join). At larger
  eval sets, swap the broadcast for an xxhash64-keyed shuffle join; the
  semantics column contract stays identical.
* Per-document outputs are exact integers plus one IEEE division:
  n_ngrams (distinct n-grams in the doc), n_contaminated (how many of
  them appear anywhere in the eval set), contam_frac, and the boolean
  flag at min_hits. Documents shorter than n words have zero n-grams and
  are clean by definition (0.0, never null).

Reference anchor: no analogue in hexhamming; training-data surface per
the round brief. The match-then-aggregate shape mirrors
ops/setjoin.token_blocking_pairs' inverted-index discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hexspark.ops.quality import word_ngrams, words_array


def eval_ngram_set(
    eval_docs: DataFrame, n: int, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-grams of the evaluation corpus: one column `gram`.

    Deduplicated eval-side, so the broadcast payload is bounded by the
    benchmark's vocabulary, not its document count.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2 for contamination checks (got {n})")
    # materialize the word array BEFORE the n-gram HOF: word_ngrams reads
    # its input once per F.get, so an inlined words_array expression would
    # re-run the tokenizer regex n times per gram (measured 60x slowdown
    # at n=8) — project first, then gram over the materialized column
    return (
        eval_docs.select(words_array(F.col(text_col)).alias("_ws"))
        .select(F.explode(word_ngrams(F.col("_ws"), n)).alias("gram"))
        .distinct()
    )


def ngram_contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Per-train-document contamination report vs an evaluation corpus.

    Returns (id, n_ngrams, n_contaminated, contam_frac, contaminated):
    distinct train-doc n-grams, how many occur anywhere in the eval set,
    their ratio, and the min_hits flag. Every train document appears in
    the output exactly once, including zero-gram ones.
    """
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1 (got {min_hits})")
    banned = F.broadcast(eval_ngram_set(eval_docs, n, text_col))
    grams = train_docs.select(
        F.col(id_col).alias("_id"),
        words_array(F.col(text_col)).alias("_ws"),  # materialize (see above)
    ).select(
        "_id",
        F.explode_outer(
            F.array_distinct(word_ngrams(F.col("_ws"), n))
        ).alias("gram"),
    )
    hit = grams.join(banned.withColumn("_hit", F.lit(1)), "gram", "left")
    per_doc = hit.groupBy("_id").agg(
        F.count(F.col("gram")).alias("n_ngrams"),
        F.count(F.col("_hit")).alias("n_contaminated"),
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_ngrams",
        "n_contaminated",
        F.when(
            F.col("n_ngrams") > 0,
            F.col("n_contaminated").cast("double") / F.col("n_ngrams"),
        )
        .otherwise(F.lit(0.0))
        .alias("contam_frac"),
        (F.col("n_contaminated") >= min_hits).alias("contaminated"),
    )
