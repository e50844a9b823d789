"""Corpus drift monitoring — distribution-shift statistics between two
corpus snapshots (yesterday's crawl vs today's, corpus vs reference
slice, pre- vs post-filter): token-distribution Jensen-Shannon
divergence, vocabulary churn, and the per-token contribution table that
tells an operator WHAT drifted, not just how much.

A continuously-ingesting 100-TB pipeline needs this as a standing job:
dedup rates, language mix, and quality-score distributions all move when
an upstream source changes silently; unigram-distribution JS divergence
is the cheap canary (CCNet and MassiveText both monitor corpus
composition this way).

Definitions (exact, replayed by the pure-Python test oracle):

* P, Q — unigram relative frequencies of snapshots A and B over the
  UNION vocabulary (tokens via ops/quality.words_array — the package's
  one shared normalization); missing tokens have probability 0.
* M = (P + Q) / 2;  JS(P, Q) = (KL(P||M) + KL(Q||M)) / 2 in bits
  (log2), the symmetric, always-finite form — bounded in [0, 1], no
  smoothing constants to tune. 0-probability terms contribute 0 by the
  x·log(x) -> 0 convention.
* Per-token contribution: js_term(w) = (p·log2(2p/(p+q)) +
  q·log2(2q/(p+q))) / 2 >= 0; the report emits the top-k by
  contribution with both frequencies — the "what changed" table.
* Vocabulary churn: |A-only vocab| / |A vocab|, |B-only| / |B|.

Execution shape: one word-count aggregate per snapshot (map-side
combinable), one full-outer join on token, one scalar aggregate for the
divergence + churn, one TakeOrderedAndProject for the top-k table — no
Python anywhere, no collect beyond the scalar row and the k-row report.
Float log sums, so pytest-pinned (NMI epistemics), not driver-hash-gated.

Reference anchor: no analogue in hexhamming; training-data surface per
the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hexspark.ops.quality import words_array


def _unigram_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(words_array(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _joint(
    docs_a: DataFrame, docs_b: DataFrame, text_col: str
) -> DataFrame:
    """Full-outer token join with per-snapshot probabilities and the
    per-token JS contribution term (in bits)."""
    ca = _unigram_counts(docs_a, text_col).select("w", F.col("c").alias("c_a"))
    cb = _unigram_counts(docs_b, text_col).select("w", F.col("c").alias("c_b"))
    j = ca.join(cb, "w", "full_outer").select(
        "w",
        F.coalesce("c_a", F.lit(0)).alias("c_a"),
        F.coalesce("c_b", F.lit(0)).alias("c_b"),
    )
    tot = j.agg(F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b"))
    j = j.crossJoin(F.broadcast(tot))  # one-row totals attach
    p = F.col("c_a") / F.col("n_a")
    q = F.col("c_b") / F.col("n_b")
    m = (p + q) / 2
    term = lambda x: F.when(x > 0, x * F.log2(x / m)).otherwise(F.lit(0.0))
    return j.select(
        "w",
        "c_a",
        "c_b",
        p.alias("p"),
        q.alias("q"),
        ((term(p) + term(q)) / 2).alias("js_term"),
    )


def js_divergence(
    docs_a: DataFrame, docs_b: DataFrame, text_col: str = "text"
) -> dict:
    """Scalar drift report: {'js_bits', 'vocab_a', 'vocab_b',
    'a_only_frac', 'b_only_frac'}. One Spark action."""
    j = _joint(docs_a, docs_b, text_col)
    row = j.agg(
        F.sum("js_term").alias("js"),
        F.sum(F.when(F.col("c_a") > 0, 1).otherwise(0)).alias("va"),
        F.sum(F.when(F.col("c_b") > 0, 1).otherwise(0)).alias("vb"),
        F.sum(F.when((F.col("c_a") > 0) & (F.col("c_b") == 0), 1).otherwise(0)).alias("ao"),
        F.sum(F.when((F.col("c_b") > 0) & (F.col("c_a") == 0), 1).otherwise(0)).alias("bo"),
    ).first()
    va, vb = int(row["va"] or 0), int(row["vb"] or 0)
    return {
        "js_bits": float(row["js"] or 0.0),
        "vocab_a": va,
        "vocab_b": vb,
        "a_only_frac": (int(row["ao"]) / va) if va else 0.0,
        "b_only_frac": (int(row["bo"]) / vb) if vb else 0.0,
    }


def drift_report(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Top-k drifted tokens by JS contribution: (w, c_a, c_b, p, q,
    js_term), ordered by js_term desc then token asc (deterministic).
    Compiles to TakeOrderedAndProject — per-partition top-k + driver
    merge, never a global sort (the progressive.py discipline)."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1 (got {top_k})")
    return (
        _joint(docs_a, docs_b, text_col)
        .orderBy(F.col("js_term").desc(), F.col("w").asc())
        .limit(top_k)
    )
