"""B8/B9 — transitive clustering: connected components on the match-edge
DataFrame via alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public paper; see
PAPERS.md), expressed entirely as DataFrame aggregations and joins.

Why this algorithm at 100 TB: each round is one groupBy + one join — no
driver-side graph, no per-node Python — and converges in O(log^2 n) rounds
(in practice <10 for duplicate-cluster graphs, whose components are tiny).
Each round's result is localCheckpoint()ed to cut lineage so the loop's
plan doesn't grow; convergence is detected with an exact star-forest test
(no root appears as a child — see _is_star_forest) on the checkpointed
rounds, which terminates the loop on the round that REACHES the answer
instead of one round later like a fixpoint comparison would.

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


def _is_star_forest(edges: DataFrame) -> bool:
    """Exact convergence test. After any round, every edge points child→root
    with root < child (small-star orients to the minimum). The state is a
    star forest — and therefore stable under further rounds — iff BOTH:

      (a) no node has two parents (each child u appears in exactly one
          edge), and
      (b) no parent is itself some other edge's child.

    Checking only (b) is unsound: the state {(c3,c0),(c3,c2),(c4,c2),
    (c5,c2),(c6,c0)} has no root-as-child yet c3 still bridges two stars
    that later rounds must merge — stopping there splits one true
    component into two clusters and assigns c3 twice. Both violations are
    found with ONE aggregation over the node incidences: a node is bad if
    it is a child more than once, or both a child and a parent. Since
    every edge points to the strictly smaller endpoint, a star's root is
    the minimum of its star, and a star that is a whole component is
    rooted at the component minimum — i.e. star forest ⟺ converged
    min-rooted answer."""
    incid = edges.select(
        F.col("u").alias("n"), F.lit(1).alias("c"), F.lit(0).alias("p")
    ).union(
        edges.select(F.col("v").alias("n"), F.lit(0).alias("c"), F.lit(1).alias("p"))
    )
    bad = (
        incid.groupBy("n")
        .agg(F.sum("c").alias("nc"), F.max("p").alias("isp"))
        .where((F.col("nc") > 1) | ((F.col("nc") >= 1) & (F.col("isp") == 1)))
    )
    return bad.isEmpty()


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> tuple[DataFrame, int]:
    """edges(conv_id_a, conv_id_b) → clusters(conv_id, cluster_id).

    cluster_id is the component's minimum conv_id (B9 canonicalization).
    Nodes with no surviving edge are not emitted — callers union isolated
    nodes as singleton clusters (see runner).

    Returns (clusters, rounds_used).
    """
    # no input distinct: duplicate edges cannot change any round's output
    # (min-aggregations are idempotent and each round ends in its own
    # distinct), so deduplicating here would be a pure extra shuffle of the
    # largest edge set the loop ever sees.
    cur = (
        edges.select(F.col("conv_id_a").alias("u"), F.col("conv_id_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .localCheckpoint(eager=True)
    )
    rounds = 0
    converged = cur.isEmpty()
    while not converged and rounds < max_iter:
        rounds += 1
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        converged = _is_star_forest(cur)
    if not converged:
        # a non-star-forest state would silently emit nodes with multiple
        # cluster_ids and split components — refuse instead
        raise RuntimeError(
            f"connected components did not converge within max_iter={max_iter} "
            "rounds; raise cc_max_iter (expected O(log^2 n) rounds)"
        )
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
