"""B12 — pairwise precision/recall/F1 against labeled pairs.

Scalable formulation: instead of materializing all intra-cluster pairs
(quadratic in cluster size), the evaluation universe is the labeled-pair
table plus the predicted match edges; a pair is *predicted* iff both sides
landed in the same cluster — two joins of the pair table against the
cluster assignment, no pair explosion.

Per BASELINE.json, evaluation is restricted to pairs at the shared blocking
key: the caller passes the candidate-pair set (pairs that shared ≥1 band)
and labeled pairs are intersected with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_f1_df(
    labeled_pairs: DataFrame,
    clusters: DataFrame,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """In-plan variant of :func:`pairwise_f1`: same joins, no collect —
    returns a ONE-ROW DataFrame (tp, fp, fn, precision, recall, f1) so the
    evaluation can be a stage inside a larger plan, a driver-oracled query,
    or a sink in its own right. ``pairwise_f1`` delegates here, so the two
    surfaces cannot diverge.

    Zero-denominator conventions match the dict variant: precision/recall
    default to 1.0 when their denominator is 0, f1 to 0.0 when p+r = 0.
    """
    labels = labeled_pairs.select("conv_id_a", "conv_id_b", "is_match")
    if candidate_pairs is not None:
        labels = labels.join(candidate_pairs, ["conv_id_a", "conv_id_b"], "inner")

    ca = clusters.select(
        F.col("conv_id").alias("conv_id_a"), F.col("cluster_id").alias("cl_a")
    )
    cb = clusters.select(
        F.col("conv_id").alias("conv_id_b"), F.col("cluster_id").alias("cl_b")
    )

    # predicted-positive universe: candidate pairs with same cluster
    base = candidate_pairs if candidate_pairs is not None else labels.select(
        "conv_id_a", "conv_id_b"
    )
    pred = (
        base.join(ca, "conv_id_a")
        .join(cb, "conv_id_b")
        .where(F.col("cl_a") == F.col("cl_b"))
        .select("conv_id_a", "conv_id_b")
    )

    pos = labels.where(F.col("is_match")).select("conv_id_a", "conv_id_b")

    # single action: full-outer join the predicted and labeled pair sets on
    # the pair key, then one conditional-count aggregate — the join pipeline
    # above is computed once instead of three times.
    merged = pred.withColumn("_pred", F.lit(1)).join(
        pos.withColumn("_pos", F.lit(1)),
        ["conv_id_a", "conv_id_b"],
        "full_outer",
    )
    counts = merged.agg(
        F.count(F.when(F.col("_pred").isNotNull() & F.col("_pos").isNotNull(), 1)).alias("tp"),
        F.count(F.when(F.col("_pred").isNotNull() & F.col("_pos").isNull(), 1)).alias("fp"),
        F.count(F.when(F.col("_pred").isNull() & F.col("_pos").isNotNull(), 1)).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(1.0))
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(1.0))
    return (
        counts.withColumn("precision", prec)
        .withColumn("recall", rec)
        .withColumn(
            "f1",
            F.when(
                F.col("precision") + F.col("recall") > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
        .select("tp", "fp", "fn", "precision", "recall", "f1")
    )


def pairwise_f1(
    labeled_pairs: DataFrame,
    clusters: DataFrame,
    candidate_pairs: DataFrame | None = None,
) -> dict[str, float]:
    """labeled_pairs(conv_id_a, conv_id_b, is_match) × clusters(conv_id,
    cluster_id) → {precision, recall, f1, tp, fp, fn}.

    Positives predicted = same cluster_id on both sides. If candidate_pairs
    is given, labeled positives are restricted to pairs at a shared blocking
    key (BASELINE.json's evaluation universe) and predicted positives are
    the candidate pairs whose endpoints share a cluster.
    """
    row = pairwise_f1_df(labeled_pairs, clusters, candidate_pairs).collect()[0]
    return {
        "precision": float(row["precision"]),
        "recall": float(row["recall"]),
        "f1": float(row["f1"]),
        "tp": float(row["tp"]),
        "fp": float(row["fp"]),
        "fn": float(row["fn"]),
    }
