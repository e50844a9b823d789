"""B6/B7 — pairwise scoring + match filter.

The hamming term is the reference's A2 kernel exactly (popcount of XOR over
32-byte signatures, python_hexhamming.h:167-197), vectorized over Arrow
batches; the match gate is A3's ``dist <= max_dist`` predicate
(python_hexhamming.cc:62-64). The secondary Jaro-Winkler term runs on the
short canonical keys, also batch-vectorized (hexspark.columns.jaro_winkler).

Plan shape: candidate_pairs is joined twice against the signatures table to
attach (sig, canon) for each side. Both joins are plain shuffle-hash/SMJ
equi-joins on conv_id — at sandbox scale AQE turns them into broadcasts;
at 10^12-turn scale signatures is too big to broadcast and the shuffle on
conv_id is the right plan. The scoring UDF itself is a narrow map stage.

    score = alpha * (1 - hamming_dist/256) + (1 - alpha) * jw(canon_a, canon_b)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import columns as C

SIG_BITS = 256
DEFAULT_MAX_DIST = 20
DEFAULT_ALPHA = 0.75


def score_pairs(pairs: DataFrame, signatures: DataFrame, alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """pairs(conv_id_a, conv_id_b) × signatures → scored
    edges(conv_id_a, conv_id_b, hamming_dist, jw, score)."""
    sigs = signatures.select("conv_id", "sig", "canon")
    scored = (
        pairs.join(
            sigs.select(
                F.col("conv_id").alias("conv_id_a"),
                F.col("sig").alias("sig_a"),
                F.col("canon").alias("canon_a"),
            ),
            "conv_id_a",
        )
        .join(
            sigs.select(
                F.col("conv_id").alias("conv_id_b"),
                F.col("sig").alias("sig_b"),
                F.col("canon").alias("canon_b"),
            ),
            "conv_id_b",
        )
        .withColumn("hamming_dist", C.hamming_bytes("sig_a", "sig_b"))
        .withColumn("jw", C.jaro_winkler("canon_a", "canon_b"))
        .withColumn(
            "score",
            F.lit(alpha) * (F.lit(1.0) - F.col("hamming_dist") / F.lit(float(SIG_BITS)))
            + F.lit(1.0 - alpha) * F.col("jw"),
        )
    )
    return scored.select("conv_id_a", "conv_id_b", "hamming_dist", "jw", "score")


def match_edges(
    scored: DataFrame,
    max_dist: int = DEFAULT_MAX_DIST,
    min_score: float = 0.0,
) -> DataFrame:
    """A3's within-distance gate as a Catalyst filter (dist <= max_dist,
    cc:62-64), plus an optional hybrid-score floor."""
    return scored.where(
        (F.col("hamming_dist") <= F.lit(max_dist)) & (F.col("score") >= F.lit(min_score))
    )
