"""Progressive (pay-as-you-go) entity resolution: when the comparison
budget is smaller than the candidate stream, order the stream so the
budget's worth of comparisons yields the most recall (Whang, Marmaros &
Garcia-Molina, "Pay-As-You-Go Entity Resolution"; Papenbrock et al.,
progressive sorted neighborhood).

Two operators:

* :func:`progressive_pairs` — rank candidate pairs by a CHEAP benefit
  proxy already sitting on the pair (shared LSH band count descending,
  then signature hamming ascending: pairs that collide in more bands and
  sit closer in hamming space are likelier matches) and emit the global
  top-``budget``. The plan is a TakeOrdered — Spark computes a
  per-partition top-``budget`` then merges, so no global sort of the full
  stream ever materializes; cost is one scan + one tiny merge regardless
  of stream size. Ties end at the id pair, so the cut is deterministic.

* :func:`recall_at_budget` — the audit curve: for each requested budget,
  how many labeled true matches the first ``b`` emitted pairs contain.
  One join against the (bounded) labeled positives, one rank window over
  JUST the positives' ranks (not the full stream), then a cumulative
  count evaluated at each budget point — integer-exact, so the curve is
  hash-comparable across engines.

At 100 TB the point of progressive ER is precisely that the full scored
stream is never produced: the proxy uses blocking-time byproducts (band
collisions, signature distance), and everything downstream of the top-k
cut is budget-proportional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def progressive_pairs(
    pairs: DataFrame,
    budget: int,
    benefit_cols: list[str] | None = None,
    ascending: list[bool] | None = None,
) -> DataFrame:
    """Top-``budget`` candidate pairs by descending benefit proxy.

    pairs must carry (conv_id_a, conv_id_b) plus the proxy columns.
    Default proxy: n_bands desc (more band collisions = likelier match),
    then dist asc if present. Output adds ``rank`` (1-based emission
    order, deterministic: ties broken by the id pair).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    cols = list(benefit_cols) if benefit_cols is not None else []
    if benefit_cols is None:
        if "n_bands" in pairs.columns:
            cols.append("n_bands")
        if "dist" in pairs.columns:
            cols.append("dist")
        if not cols:
            raise ValueError(
                "pairs carry neither n_bands nor dist; pass benefit_cols"
            )
        asc = [c == "dist" for c in cols]
    else:
        asc = list(ascending) if ascending is not None else [False] * len(cols)
        if len(asc) != len(cols):
            raise ValueError("ascending must match benefit_cols length")
    order = [
        (F.asc(c) if a else F.desc(c)) for c, a in zip(cols, asc)
    ] + [F.asc("conv_id_a"), F.asc("conv_id_b")]
    w = Window.orderBy(*order)
    # a single global window would funnel the whole stream through one
    # partition; orderBy().limit() instead compiles to TakeOrderedAndProject
    # (per-partition top-k + driver merge). The rank is then re-derived on
    # the budget-sized result, where a one-partition window is free.
    top = pairs.orderBy(*order).limit(budget)
    return top.withColumn("rank", F.row_number().over(w))


def recall_at_budget(
    ranked_pairs: DataFrame,
    labeled_pairs: DataFrame,
    budgets: list[int],
) -> DataFrame:
    """The progressive audit curve: (budget, n_covered, n_true_matches).

    ranked_pairs: progressive_pairs output (needs conv_id_a, conv_id_b,
    rank). n_covered = labeled true matches among the first ``budget``
    emitted pairs; integer-exact.
    """
    if not budgets:
        raise ValueError("budgets must be non-empty")
    pos = labeled_pairs.where(F.col("is_match")).select("conv_id_a", "conv_id_b")
    hit_ranks = ranked_pairs.join(pos, ["conv_id_a", "conv_id_b"]).select("rank")
    n_true = pos.agg(F.count(F.lit(1)).alias("n_true_matches"))
    bud = ranked_pairs.sparkSession.createDataFrame(
        [(int(b),) for b in sorted(set(budgets))], "budget long"
    )
    covered = (
        bud.join(hit_ranks, hit_ranks.rank <= bud.budget, "left")
        .groupBy("budget")
        .agg(F.count(F.col("rank")).alias("n_covered"))
    )
    return covered.crossJoin(n_true).select("budget", "n_covered", "n_true_matches")
