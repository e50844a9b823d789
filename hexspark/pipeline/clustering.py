"""B8/B9 — transitive clustering: connected components on the match-edge
DataFrame via alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public paper; see
PAPERS.md), expressed entirely as DataFrame aggregations and joins.

Why this algorithm at 100 TB: each round is one groupBy + one join — no
driver-side graph, no per-node Python — and converges in O(log^2 n) rounds
(in practice <10 for duplicate-cluster graphs, whose components are tiny).
Each round's result is localCheckpoint()ed to cut lineage so the loop's
plan doesn't grow; convergence is detected with an order-insensitive
(count, hash-sum) checksum instead of an exceptAll anti-join, which keeps
the per-round overhead to one cheap aggregate.

Node ids are the string conv_ids; "min" is lexicographic min, deterministic
and collision-free at any scale (no 64-bit hash-collision risk at 10^12
nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star: for every node u, connect each strictly-larger neighbor
    to the minimum of N(u) ∪ {u}."""
    nbrs = edges.select(F.col("u"), F.col("v")).union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star: orient edges toward the smaller endpoint; for every node
    u, connect all its smaller-or-equal neighbors (and u) to the minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    nbrs = oriented
    mins = nbrs.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        nbrs.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: sum of 2^63-scale hashes cannot overflow a
        # 38-digit decimal below ~10^19 rows (ANSI mode rejects long sums)
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> tuple[DataFrame, int]:
    """edges(conv_id_a, conv_id_b) → clusters(conv_id, cluster_id).

    cluster_id is the component's minimum conv_id (B9 canonicalization).
    Nodes with no surviving edge are not emitted — callers union isolated
    nodes as singleton clusters (see runner).

    Returns (clusters, rounds_used).
    """
    cur = (
        edges.select(F.col("conv_id_a").alias("u"), F.col("conv_id_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sum: tuple[int, int] | None = None
    rounds = 0
    for rounds in range(1, max_iter + 1):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig = _checksum(cur)
        if sig == prev_sum:
            break
        prev_sum = sig
    # converged state: every edge is (node, root); roots themselves appear
    # only on the right side → add (root, root) rows.
    clusters = cur.select(
        F.col("u").alias("conv_id"), F.col("v").alias("cluster_id")
    ).union(
        cur.select(F.col("v").alias("conv_id"), F.col("v").alias("cluster_id")).distinct()
    ).distinct()
    return clusters, rounds


def with_singletons(clusters: DataFrame, all_nodes: DataFrame) -> DataFrame:
    """Union singleton clusters for nodes that had no match edge.
    all_nodes: DataFrame with a conv_id column."""
    singles = (
        all_nodes.select("conv_id")
        .join(clusters.select("conv_id"), "conv_id", "left_anti")
        .select(F.col("conv_id"), F.col("conv_id").alias("cluster_id"))
    )
    return clusters.unionByName(singles)
