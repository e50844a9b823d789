"""CEAF — Constrained Entity-Alignment F-measure (Luo, EMNLP 2005):
the third classic coreference metric next to MUC (link-based) and B-cubed
(record-based), scoring the OPTIMAL one-to-one alignment between system
clusters and true entities, so a system cannot farm credit by splitting
one entity over many clusters (each true entity is creditable through at
most one cluster). Both standard variants:

  CEAF-m  (mention-based, phi3 = |C ∩ E|): score = Phi/n on the
          co-assigned universe (precision = recall there, since both
          partitions cover the same n records).
  CEAF-e  (entity-based, phi4 = 2|C∩E| / (|C|+|E|)):
          precision = Phi4/#clusters, recall = Phi4/#entities.

Exactness at scale — the alignment DECOMPOSES: a cluster and an entity
can only be aligned profitably if they share a record, so the optimal
matching splits by connected component of the bipartite contingency-cell
graph, and ER contingency components are entity-sized (a handful of
cells), not corpus-sized. The plan is therefore: one groupBy to the
contingency cells, one connected-components run over the cell graph
(cluster/entity ids as prefixed nodes), then ONE applyInPandas group per
component computing the exact optimal assignment by bitmask DP over the
smaller side (O(cells · 2^m)); component results fold with two scalar
aggregates. Components whose smaller side exceeds ``max_side`` fall back
to a greedy alignment flagged exact=false (same honest-cap discipline as
medoids/HAC) — at the default 18 that is one-in-never for real ER
contingencies.

phi3 weights are integer record counts, so CEAF-m's Phi is an exact long;
CEAF-e's phi4 are dyadic-rational floats summed per component then across
components (pytest-pinned like the other float metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import connected_components

_COMP_SCHEMA = (
    "phi_m long, phi_e double, n_cells long, exact boolean"
)


def _optimal_alignment(pdf, max_side: int):
    """Exact max-weight one-to-one alignment of one component's cells for
    BOTH phi3 (integer overlap) and phi4 (2o/(|C|+|E|)), via bitmask DP
    over the smaller side. Greedy fallback (weight-desc, id tie-break)
    above ``max_side``, flagged exact=false."""
    import pandas as pd

    clusters = sorted(set(pdf["cluster_id"]))
    entities = sorted(set(pdf["entity_id"]))
    # DP over the smaller side's subsets
    if len(entities) <= len(clusters):
        rows_, cols_ = clusters, entities
        rkey, ckey = "cluster_id", "entity_id"
    else:
        rows_, cols_ = entities, clusters
        rkey, ckey = "entity_id", "cluster_id"
    cidx = {v: i for i, v in enumerate(cols_)}
    w3: dict[tuple[int, int], int] = {}
    w4: dict[tuple[int, int], float] = {}
    for r in pdf.itertuples(index=False):
        i = rows_.index(getattr(r, rkey))
        j = cidx[getattr(r, ckey)]
        w3[(i, j)] = int(r.o)
        w4[(i, j)] = 2.0 * r.o / (r.c_size + r.e_size)

    def solve(w):
        m = len(cols_)
        if m <= max_side:
            NEG = float("-inf")
            dp = [0.0] + [NEG] * ((1 << m) - 1)
            for i in range(len(rows_)):
                nxt = dp[:]
                for mask in range(1 << m):
                    if dp[mask] == NEG:
                        continue
                    for j in range(m):
                        if mask & (1 << j) or (i, j) not in w:
                            continue
                        nm = mask | (1 << j)
                        cand = dp[mask] + w[(i, j)]
                        if cand > nxt[nm]:
                            nxt[nm] = cand
                dp = nxt
            return max(v for v in dp if v != NEG), True
        # greedy fallback: take cells by (weight desc, ids asc)
        taken_r: set[int] = set()
        taken_c: set[int] = set()
        tot = 0.0
        for (i, j), v in sorted(w.items(), key=lambda kv: (-kv[1], kv[0])):
            if i not in taken_r and j not in taken_c:
                taken_r.add(i)
                taken_c.add(j)
                tot += v
        return tot, False

    phi_m, ok3 = solve(w3)
    phi_e, ok4 = solve(w4)
    return pd.DataFrame(
        [(int(round(phi_m)), float(phi_e), len(pdf), bool(ok3 and ok4))],
        columns=["phi_m", "phi_e", "n_cells", "exact"],
    )


def ceaf_df(
    clusters: DataFrame,
    truth: DataFrame,
    id_col: str = "conv_id",
    max_side: int = 18,
) -> DataFrame:
    """clusters(id_col, cluster_id) × truth(id_col, entity_id) → ONE row:
    (n_records, n_clusters, n_entities, phi_m, ceaf_m, ceaf_e_precision,
    ceaf_e_recall, ceaf_e_f1, all_exact). Records missing from either
    side are dropped (inner join), as for the sibling metrics."""
    asg = clusters.select(id_col, "cluster_id").join(
        truth.select(id_col, "entity_id"), id_col
    )
    cells = asg.groupBy("cluster_id", "entity_id").agg(
        F.count(F.lit(1)).alias("o")
    )
    c_sizes = cells.groupBy("cluster_id").agg(F.sum("o").alias("c_size"))
    e_sizes = cells.groupBy("entity_id").agg(F.sum("o").alias("e_size"))
    full = (
        cells.join(c_sizes, "cluster_id").join(e_sizes, "entity_id")
        .localCheckpoint(eager=True)
    )
    comp_edges = full.select(
        F.concat(F.lit("c:"), F.col("cluster_id")).alias("conv_id_a"),
        F.concat(F.lit("e:"), F.col("entity_id")).alias("conv_id_b"),
    )
    cc, _ = connected_components(comp_edges)
    comp = cc.where(F.col("conv_id").startswith("c:")).select(
        F.expr("substring(conv_id, 3)").alias("cluster_id"),
        F.col("cluster_id").alias("component"),
    )
    per_comp = (
        full.join(comp, "cluster_id")
        .groupBy("component")
        .applyInPandas(
            lambda pdf: _optimal_alignment(pdf, max_side), _COMP_SCHEMA
        )
    )
    phis = per_comp.agg(
        F.sum("phi_m").alias("phi_m"),
        F.sum("phi_e").alias("phi_e"),
        F.min(F.col("exact").cast("int")).alias("_ex"),
    )
    counts = full.agg(
        F.sum("o").alias("n_records"),
        F.count_distinct("cluster_id").alias("n_clusters"),
        F.count_distinct("entity_id").alias("n_entities"),
    )
    one = counts.crossJoin(phis)
    pm = F.col("phi_m").cast("double") / F.col("n_records")
    pe = F.col("phi_e") / F.col("n_clusters")
    re_ = F.col("phi_e") / F.col("n_entities")
    fe = F.when(pe + re_ > 0, 2 * pe * re_ / (pe + re_)).otherwise(F.lit(0.0))
    return one.select(
        "n_records",
        "n_clusters",
        "n_entities",
        "phi_m",
        F.round(pm, 6).alias("ceaf_m"),
        F.round(pe, 6).alias("ceaf_e_precision"),
        F.round(re_, 6).alias("ceaf_e_recall"),
        F.round(fe, 6).alias("ceaf_e_f1"),
        (F.col("_ex") == 1).alias("all_exact"),
    )
