"""Blocking-scheme selection: given a multi-pass candidate stream with
per-pair pass provenance and a labeled sample, pick the subset of passes
that maximizes recall under a candidate-pair budget — greedy weighted set
cover, the classical blocking-scheme-learning move (Michelson & Knoblock,
"Learning Blocking Schemes for Record Linkage"; Bilenko et al.) reduced to
two tiny exact aggregates.

Why this shape scales: the expensive object (the candidate stream) is never
collected. Spark reduces it to
  * combo_counts — one row per DISTINCT pass combination with its pair
    count (provenance arrays come from blocking.union_candidates, so a
    pair contributes once no matter how many passes emitted it); with k
    passes this is <= 2^k - 1 rows, in practice a handful, and it lets the
    driver price the exact DEDUPED union cost of any pass subset S as
    sum(count for combos intersecting S) — no inclusion-exclusion, no
    re-scan per subset.
  * label_coverage — one row per covered labeled positive with its pass
    list (the labeled sample is bounded by construction).
The greedy loop then runs on the driver over these two small tables:
repeatedly add the pass with the best (marginal newly-covered positives,
lowest marginal pair cost, name) until the budget blocks every remaining
gain. Deterministic; ties never depend on partitioning.

Greedy set cover is (1 - 1/e)-approximate in the unbudgeted case; the
output reports per-step marginals so a human can audit the curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_blocking_scheme(
    labeled_pairs: DataFrame,
    union_pairs: DataFrame,
    pair_budget: int,
) -> dict:
    """Pick blocking passes under a candidate-pair budget.

    labeled_pairs: (conv_id_a, conv_id_b, is_match)
    union_pairs:   blocking.union_candidates output
                   (conv_id_a, conv_id_b, passes array<string>, n_passes)

    Returns {selected, n_candidates, n_covered, n_true_matches, steps}
    where steps records each greedy pick's exact marginals.
    """
    if pair_budget < 0:
        raise ValueError(f"pair_budget must be >= 0, got {pair_budget}")
    combo_counts = [
        (tuple(r["passes"]), r["n"])
        for r in union_pairs.groupBy("passes")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    pos = labeled_pairs.where(F.col("is_match")).select("conv_id_a", "conv_id_b")
    n_true = pos.count()
    covered_rows = (
        union_pairs.join(pos, ["conv_id_a", "conv_id_b"])
        .select("conv_id_a", "conv_id_b", "passes")
        .collect()
    )
    label_coverage = [
        ((r["conv_id_a"], r["conv_id_b"]), frozenset(r["passes"]))
        for r in covered_rows
    ]
    all_passes = sorted({p for combo, _ in combo_counts for p in combo})

    def union_cost(sel: frozenset) -> int:
        return sum(n for combo, n in combo_counts if sel.intersection(combo))

    def union_recall(sel: frozenset) -> int:
        return sum(1 for _, ps in label_coverage if sel.intersection(ps))

    selected: list[str] = []
    steps: list[dict] = []
    cur = frozenset()
    cur_cost, cur_recall = 0, 0
    remaining = set(all_passes)
    while remaining:
        best = None
        for p in sorted(remaining):
            nxt = cur | {p}
            cost = union_cost(nxt)
            if cost > pair_budget:
                continue
            gain = union_recall(nxt) - cur_recall
            dcost = cost - cur_cost
            # max recall gain, then min marginal cost, then name — total order
            key = (-gain, dcost, p)
            if best is None or key < best[0]:
                best = (key, p, gain, cost)
        if best is None or best[2] <= 0:
            break
        _, p, gain, cost = best
        selected.append(p)
        remaining.discard(p)
        cur = cur | {p}
        steps.append(
            {
                "pass": p,
                "marginal_covered": gain,
                "marginal_candidates": cost - cur_cost,
                "total_candidates": cost,
            }
        )
        cur_cost, cur_recall = cost, cur_recall + gain
    return {
        "selected": selected,
        "n_candidates": cur_cost,
        "n_covered": cur_recall,
        "n_true_matches": n_true,
        "steps": steps,
    }
