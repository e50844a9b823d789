"""Cluster stability: how confident is each merge? Bootstrap the match
graph by deterministic edge subsampling, re-cluster each replicate, and
score every original edge by its co-clustering frequency — edges whose
endpoints stay together only when the edge itself survives are fragile
single-path merges (the global, path-redundancy generalization of the
local triangle-corroboration signal in ops/graph.py).

This is the model-averaging / consensus-clustering move (Monti et al.,
"Consensus Clustering"; stability selection, Meinshausen & Bühlmann)
specialized to transitive-closure ER: a bridge edge gluing two real
entities co-clusters in roughly keep_frac of replicates (only when it
itself is sampled), while an edge inside a well-corroborated entity
co-clusters in ALL replicates — any surviving path reconnects it.

Determinism: replicate membership is a content hash (xxhash64 of the
canonical edge key, the replicate index, and the seed) — no RNG state, no
partitioning sensitivity, identical across runs and cluster sizes. Cost:
n_samples connected-components runs over ~keep_frac of the edges each —
embarrassingly parallel across replicates, each the standard O(log^2 n)
CC envelope; per-edge scoring is one label join per replicate keyed on
node ids. n_samples is a small constant (8-16), not a function of data
size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .clustering import connected_components


def replicate_kept(
    id_a: Column, id_b: Column, sample: int, seed: int, keep_frac: float
) -> Column:
    """Deterministic edge-in-replicate predicate: pmod(xxhash64(edge key,
    sample, seed), 1000) < keep_frac * 1000. Public so audits and tests can
    reconstruct every replicate's edge set exactly."""
    h = F.xxhash64(
        F.least(id_a, id_b), F.greatest(id_a, id_b), F.lit(sample), F.lit(seed)
    )
    return F.pmod(h, F.lit(1000)) < F.lit(int(round(keep_frac * 1000)))


def edge_stability(
    edges: DataFrame,
    n_samples: int = 8,
    keep_frac: float = 0.8,
    seed: int = 7,
    max_iter: int = 20,
) -> DataFrame:
    """Score every distinct edge by bootstrap co-clustering frequency.

    edges: (conv_id_a, conv_id_b). Returns (conv_id_a, conv_id_b,
    n_cocluster, n_samples) with a <= b canonical orientation —
    n_cocluster = in how many replicates the endpoints landed in the same
    component (integer-exact; divide at the consumer's edge). Low
    n_cocluster = fragile merge → review queue; n_cocluster == n_samples
    = path-redundant merge.
    """
    if n_samples < 1:
        raise ValueError(f"n_samples must be >= 1, got {n_samples}")
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    canon = (
        edges.select(
            F.least("conv_id_a", "conv_id_b").alias("conv_id_a"),
            F.greatest("conv_id_a", "conv_id_b").alias("conv_id_b"),
        )
        .where(F.col("conv_id_a") != F.col("conv_id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    scored = None
    for s in range(n_samples):
        kept = canon.where(
            replicate_kept(F.col("conv_id_a"), F.col("conv_id_b"), s, seed, keep_frac)
        )
        cc, _ = connected_components(kept, max_iter=max_iter)
        la = cc.select(
            F.col("conv_id").alias("conv_id_a"), F.col("cluster_id").alias("_la")
        )
        lb = cc.select(
            F.col("conv_id").alias("conv_id_b"), F.col("cluster_id").alias("_lb")
        )
        co = (
            canon.join(la, "conv_id_a", "left")
            .join(lb, "conv_id_b", "left")
            .select(
                "conv_id_a",
                "conv_id_b",
                (
                    F.col("_la").isNotNull()
                    & (F.col("_la") == F.col("_lb"))
                ).cast("long").alias("_co"),
            )
        )
        scored = co if scored is None else scored.unionByName(co)
    return (
        scored.groupBy("conv_id_a", "conv_id_b")
        .agg(F.sum("_co").alias("n_cocluster"))
        .withColumn("n_samples", F.lit(n_samples))
    )
