"""B7-alt — one-to-one bipartite assignment (mutual best match).

Linking two record sets (not deduplicating one) usually carries a
cardinality constraint: each left record matches AT MOST one right record
and vice versa. The scalable standard is mutual-best (symmetric best
match): keep a scored pair iff each side is the other's best-scoring
partner. It is the fixed point every greedy stable-assignment pass reaches
first, needs no iteration, and is embarrassingly parallel:

    two row_number windows (one keyed on each side) + a conjunction.

Each window is a hash exchange on its id column — the same envelope as any
per-key top-1 at 100 TB. Ties are broken deterministically by the partner
id ascending, so the output is partitioning- and engine-independent.

Greedy sequential assignment (repeatedly take the globally best remaining
pair) is NOT implemented: it is inherently order-sequential (each pick
invalidates others) — on a cluster it devolves into driver-side iteration
with a shrinking candidate set. Mutual-best emits exactly the
uncontested subset of greedy's output and is what production linkage
systems ship for the one-pass case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mutual_best_match(
    scored_pairs: DataFrame,
    left_id: str,
    right_id: str,
    score: str = "score",
    descending: bool = True,
) -> DataFrame:
    """Filter scored candidate pairs down to mutual-best one-to-one
    matches. Input: (left_id, right_id, score [, ...passthrough]); output:
    the same columns for exactly the pairs where the right record is the
    left record's best AND the left is the right's best. ``descending``
    controls whether higher or lower scores are better (similarity vs
    distance)."""
    s = F.desc(score) if descending else F.asc(score)
    w_left = Window.partitionBy(left_id).orderBy(s, F.asc(right_id))
    w_right = Window.partitionBy(right_id).orderBy(s, F.asc(left_id))
    return (
        scored_pairs.withColumn("_rl", F.row_number().over(w_left))
        .withColumn("_rr", F.row_number().over(w_right))
        .where((F.col("_rl") == 1) & (F.col("_rr") == 1))
        .drop("_rl", "_rr")
    )


def group_linkage(
    member_sims: DataFrame,
    sizes_a: DataFrame,
    sizes_b: DataFrame,
    min_score: float = 0.0,
) -> DataFrame:
    """Group linkage (On et al., "Group Linkage", ICDE'07): score a pair of
    GROUPS by a one-to-one matching between their members — for transcript
    tables, the natural "are these two conversations the same session?"
    measure built from per-TURN similarities instead of one flattened
    document fingerprint.

    member_sims: (group_a, group_b, member_a, member_b, sim) — candidate
    member pairs with sims in [0, 1], e.g. per-turn digest equality or
    normalized edit similarity from align.turn_signatures; only pairs from
    candidate GROUP pairs should be present (group blocking happens
    upstream).
    sizes_a/sizes_b: (group_a, n_a) / (group_b, n_b) member counts.

    Member assignment is the mutual-best fixed point computed WITHIN each
    group pair (two row_number windows keyed on (group_a, group_b,
    member)), so assignment never leaks across group pairs. The group
    score is the Jaccard-normalized matching value
        sim_sum / (n_a + n_b - n_matched)
    — 1.0 iff the groups are identical under a perfect matching, with
    unmatched members diluting the score symmetrically.

    Returns (group_a, group_b, n_matched, sim_sum, n_a, n_b, score),
    filtered to score >= min_score. Plan: two window exchanges keyed on
    (group pair, member), one aggregate on the group pair, two joins
    against the (group-keyed, typically broadcastable) size tables.
    """
    w_a = Window.partitionBy("group_a", "group_b", "member_a").orderBy(
        F.desc("sim"), F.asc("member_b")
    )
    w_b = Window.partitionBy("group_a", "group_b", "member_b").orderBy(
        F.desc("sim"), F.asc("member_a")
    )
    assigned = (
        member_sims.withColumn("_ra", F.row_number().over(w_a))
        .withColumn("_rb", F.row_number().over(w_b))
        .where((F.col("_ra") == 1) & (F.col("_rb") == 1))
    )
    agg = assigned.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("sim").alias("sim_sum"),
    )
    out = (
        agg.join(sizes_a, "group_a")
        .join(sizes_b, "group_b")
        .withColumn(
            "score",
            F.col("sim_sum") / (F.col("n_a") + F.col("n_b") - F.col("n_matched")),
        )
        .select(
            "group_a", "group_b", "n_matched", "sim_sum", "n_a", "n_b", "score"
        )
    )
    return out.where(F.col("score") >= F.lit(min_score))
