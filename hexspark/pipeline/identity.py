"""Persistent entity ids: downstream consumers key on entity ids, and the
B9 canonical form (cluster_id = min member id) CHURNS under incremental
folds — a new conversation with a lexicographically smaller id deposes an
entity's id even though the entity didn't change, and every fact table
keyed on the old id goes stale. This module pins entity identity across
runs with a deterministic continuity rule.

Rule (the standard registry pattern, e.g. Tamr/Zingg-style persistent ids):
for each CURRENT cluster, look at its members' PRIOR entity ids;
  * the cluster inherits the prior entity id that covers the most of its
    members (majority carry-over; ties broken by the smaller prior id) —
    so pure growth, renames, and member-id churn never mint a new entity;
  * a prior entity id is never given to two current clusters: when a prior
    entity SPLITS, the fragment with more members keeps the id (ties: the
    fragment containing the smaller min member id) and the others mint
    fresh ids; when entities MERGE, the combined cluster keeps the id of
    its largest prior constituent and the other ids are RETIRED (emitted
    in the retirements output so consumers can tombstone);
  * clusters of entirely new members mint ``new:<min member id>``.

Everything is two aggregates and two window top-1s keyed on cluster/prior
ids — no iteration, no driver state; the registry IS the previous
assignment table, so the operator is a pure function
(prior_assignments, current_clusters) -> (assignments, retirements).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stable_entity_ids(
    current: DataFrame,
    prior: DataFrame | None,
) -> tuple[DataFrame, DataFrame]:
    """current(conv_id, cluster_id) × prior(conv_id, entity_id) ->
    (assignments(conv_id, cluster_id, entity_id), retirements(entity_id,
    absorbed_into)).

    With prior=None every cluster mints ``new:<min member id>`` — the
    bootstrap run that creates the registry.
    """
    if prior is None:
        assignments = current.withColumn(
            "entity_id",
            F.concat(
                F.lit("new:"),
                F.min("conv_id").over(Window.partitionBy("cluster_id")).cast("string"),
            ),
        )
        empty = assignments.sparkSession.createDataFrame(
            [], "entity_id string, absorbed_into string"
        )
        return assignments.select("conv_id", "cluster_id", "entity_id"), empty

    overlap = current.join(
        prior.select("conv_id", F.col("entity_id").alias("_pe")), "conv_id"
    )
    votes = overlap.groupBy("cluster_id", "_pe").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("conv_id").alias("_min_member"),
    )
    # each cluster's candidate: its best-covered prior entity
    w_cluster = Window.partitionBy("cluster_id").orderBy(
        F.desc("_n"), F.asc("_pe")
    )
    want = votes.withColumn("_rk", F.row_number().over(w_cluster)).where(
        F.col("_rk") == 1
    )
    # each prior entity goes to at most ONE cluster: the wanting cluster
    # with the most members carried (ties: the one holding the smaller
    # min member id, then the smaller cluster_id — total order)
    w_entity = Window.partitionBy("_pe").orderBy(
        F.desc("_n"), F.asc("_min_member"), F.asc("cluster_id")
    )
    keep = (
        want.withColumn("_rke", F.row_number().over(w_entity))
        .where(F.col("_rke") == 1)
        .select("cluster_id", F.col("_pe").alias("entity_id"))
    )
    mins = current.groupBy("cluster_id").agg(F.min("conv_id").alias("_min_member"))
    resolved = mins.join(keep, "cluster_id", "left").withColumn(
        "entity_id",
        F.coalesce(
            F.col("entity_id"),
            F.concat(F.lit("new:"), F.col("_min_member").cast("string")),
        ),
    )
    assignments = current.join(
        resolved.select("cluster_id", "entity_id"), "cluster_id"
    ).select("conv_id", "cluster_id", "entity_id")

    # retirements: prior entity ids that NO current cluster kept (anti-join
    # against the kept set — an id kept by any cluster is live even if most
    # of its old members moved elsewhere), each absorbed into the id where
    # the majority of its members landed
    member_dest = overlap.join(
        resolved.select("cluster_id", F.col("entity_id").alias("_dest")),
        "cluster_id",
    )
    w_retire = Window.partitionBy("_pe").orderBy(F.desc("_n"), F.asc("_dest"))
    retirements = (
        member_dest.groupBy("_pe", "_dest")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_rk", F.row_number().over(w_retire))
        .where(F.col("_rk") == 1)
        .join(
            keep.select(F.col("entity_id").alias("_pe")), "_pe", "left_anti"
        )
        .select(
            F.col("_pe").alias("entity_id"), F.col("_dest").alias("absorbed_into")
        )
    )
    return assignments, retirements
