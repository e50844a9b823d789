"""Iterative match-merge ER (the Swoosh family — Benjelloun, Garcia-Molina
et al., "Swoosh: a generic approach to entity resolution", VLDB J. 2009 —
public paper): resolution where MERGING records creates evidence that
unlocks matches neither constituent had. The classic shape: record A
matches B; the merged record (A+B)'s combined attributes now match C,
which matched neither A nor B directly. One-shot blocking+clustering can
never find A,B,C together; match-merge iterates to the closure.

This module implements the ROUND-SYNCHRONOUS variant: every round matches
ALL current entities pairwise (exact set-similarity join), groups the
match graph's connected components, and merges each component by token
UNION — then repeats on the merged entities until a round produces no
edge. Round-synchronous is deterministic for ANY matcher (sequential
R-Swoosh is order-sensitive unless the matcher satisfies the ICAR
properties, which similarity thresholds famously do not — Jaccard is not
monotone under union), and it is the only variant with a sane distributed
shape: each round is

  1. one exact prefix-filter set-similarity join over the CURRENT entity
     set (ops/setjoin.prefix_sim_join — inverted index, never all-pairs),
  2. one connected-components run over that round's match edges
     (clustering.connected_components — the O(log^2 n) star loop),
  3. one groupBy merging token sets and member lists.

Entity count strictly decreases every round that finds an edge, so the
loop terminates; duplicate-entity workloads converge in 2-3 rounds. Token
sets grow only by union within a true entity (bounded by the entity's
vocabulary, not the corpus); member lists are carried for the final
record->entity mapping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ops.setjoin import prefix_sim_join
from .clustering import connected_components


def match_merge_er(
    df: DataFrame,
    id_col: str,
    text: Column,
    threshold: float,
    measure: str = "jaccard",
    max_rounds: int = 10,
) -> tuple[DataFrame, DataFrame, int]:
    """Run round-synchronous match-merge ER to its fixpoint.

    Returns (assignments, entities, rounds):
      assignments(rec_id, entity_id)         — every input record
      entities(entity_id, n_members, tokens) — merged token set per entity
                                               (sorted array), entity_id =
                                               min member rec_id
      rounds — number of merge rounds that found at least one match

    ``threshold``/``measure`` as in prefix_sim_join (jaccard / cosine /
    dice / overlap). Raises if the loop has not reached the fixpoint
    within ``max_rounds`` (each merging round strictly shrinks the entity
    set, so this only fires on pathological thresholds)."""
    from ..ops.setjoin import tokens as tokenize

    toks = tokenize(df, id_col, text).groupBy(id_col).agg(
        F.array_sort(F.collect_set("token")).alias("tokens")
    )
    # records with no token can never match: carry them as singletons
    no_tok = (
        df.select(F.col(id_col)).distinct()
        .join(toks.select(id_col), id_col, "left_anti")
        .select(
            F.col(id_col).alias("entity_id"),
            F.array(F.col(id_col)).alias("members"),
            F.array().cast("array<string>").alias("tokens"),
        )
    )
    cur = toks.select(
        F.col(id_col).alias("entity_id"),
        F.array(F.col(id_col)).alias("members"),
        "tokens",
    ).localCheckpoint(eager=True)
    rounds = 0
    while True:
        pairs = prefix_sim_join(
            cur.select("entity_id", F.array_join("tokens", " ").alias("_t")),
            "entity_id",
            F.col("_t"),
            threshold=threshold,
            measure=measure,
        ).select(
            F.col("entity_id_a").alias("conv_id_a"),
            F.col("entity_id_b").alias("conv_id_b"),
        ).localCheckpoint(eager=True)
        if pairs.isEmpty():
            break
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"match-merge ER did not reach its fixpoint within "
                f"max_rounds={max_rounds}; raise max_rounds"
            )
        cc, _ = connected_components(pairs)
        merged = (
            cur.join(
                cc.select(
                    F.col("conv_id").alias("entity_id"), "cluster_id"
                ),
                "entity_id",
                "left",
            )
            .withColumn(
                "cluster_id", F.coalesce("cluster_id", "entity_id")
            )
            .groupBy("cluster_id")
            .agg(
                F.array_sort(F.flatten(F.collect_list("members"))).alias(
                    "members"
                ),
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("tokens")))
                ).alias("tokens"),
            )
            .select(
                F.col("cluster_id").alias("entity_id"), "members", "tokens"
            )
        )
        cur = merged.localCheckpoint(eager=True)
    final = cur.unionByName(no_tok)
    assignments = final.select(
        F.explode("members").alias("rec_id"), "entity_id"
    )
    entities = final.select(
        "entity_id", F.size("members").alias("n_members"), "tokens"
    )
    return assignments, entities, rounds
