"""Seeded label propagation over the match graph — semi-supervised ER:
when part of the corpus already carries trusted entity labels (a curated
registry, a prior run's persistent entity ids, a human-reviewed sample),
propagate those labels to the unlabeled records through the match edges
instead of clustering from scratch. The classic LPA idea (Raghavan et al.
2007) in its SEEDED, layered form: seeds are frozen; each synchronous
round, every still-unlabeled record adjacent to at least one labeled
record adopts the MAJORITY label among its labeled neighbors (ties break
to the lexicographically smallest label); newly labeled records freeze
and propagate in the next round. Records with no path to a seed stay
unlabeled — by design, they are the "new entity" stream the registry has
never seen (route them to the normal clustering + id-minting path).

Freezing makes the algorithm deterministic and convergent (unseeded LPA
famously oscillates and is order-sensitive): assignments only grow, every
round labels at least one record or stops, and the round count is bounded
by the graph's seed-eccentricity (entity neighborhoods: 1-2 rounds).

Scale shape per round: one equi-join of the symmetric edges against the
labeled set, one anti-join restricting to unlabeled targets, one
(node, label) count aggregate + one min_by majority pick — all keyed on
node ids; the labeled set is localCheckpoint()ed so the loop's plan stays
flat (same discipline as clustering's rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate_labels(
    edges: DataFrame,
    seeds: DataFrame,
    a: str = "conv_id_a",
    b: str = "conv_id_b",
    id_col: str = "conv_id",
    label_col: str = "label",
    max_iter: int = 20,
) -> tuple[DataFrame, int]:
    """edges(a, b) × seeds(id_col, label_col) →
    (labels(conv_id, label, hops), rounds): every record reachable from a
    seed, with the label it adopted and the round it froze (hops = 0 for
    seeds). Unreachable records are absent — callers union them into the
    unlabeled/new-entity path. Duplicate seed rows must agree: a seed id
    with two distinct labels raises (a corrupt registry should fail loud,
    not resolve by tie-break)."""
    conflicts = (
        seeds.groupBy(id_col)
        .agg(F.count_distinct(label_col).alias("_n"))
        .where(F.col("_n") > 1)
    )
    if not conflicts.isEmpty():
        raise ValueError(
            "seeds carry conflicting labels for at least one id "
            f"(e.g. {conflicts.limit(3).collect()})"
        )
    sym = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(b).alias("u"), F.col(a).alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        .localCheckpoint(eager=True)
    )
    labeled = (
        seeds.select(
            F.col(id_col).alias("node"),
            F.col(label_col).alias("label"),
            F.lit(0).alias("hops"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while True:
        votes = (
            sym.join(
                labeled.select(F.col("node").alias("u"), "label"), "u"
            )
            .select(F.col("v").alias("node"), "label")
            .join(labeled.select("node"), "node", "left_anti")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        new = votes.groupBy("node").agg(
            F.min_by("label", F.struct(-F.col("cnt"), F.col("label"))).alias(
                "label"
            )
        )
        if new.isEmpty():
            break
        rounds += 1
        if rounds > max_iter:
            # silently stopping would leave seed-REACHABLE records
            # unlabeled, breaking the return contract — fail loud
            raise RuntimeError(
                f"label propagation still assigning after max_iter="
                f"{max_iter} rounds; raise max_iter (bounded by the "
                "graph's seed eccentricity)"
            )
        labeled = labeled.unionByName(
            new.select("node", "label", F.lit(rounds).alias("hops"))
        ).localCheckpoint(eager=True)
    return (
        labeled.select(
            F.col("node").alias("conv_id"), "label", "hops"
        ),
        rounds,
    )
