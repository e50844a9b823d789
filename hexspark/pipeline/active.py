"""Active-learning pair selection: spend a labeling budget where it matters.

An ER deployment at 10^12-turn scale cannot label candidate pairs at
random — the interesting pairs (the ones that move the decision threshold
or the Fellegi-Sunter m/u estimates, pipeline/fs.py) sit NEAR the decision
boundary, and boundary density is a vanishing fraction of the pair stream.
These operators pick the pairs a human (or a strong teacher model) should
look at next, straight off the scored-edge DataFrame the production
pipeline already materializes (pipeline/scoring.py:score_wide).

Three classical selectors, each expressed so the expensive part never
leaves the JVM:

* ``uncertainty_pairs``     — global top-k by margin |score - threshold|
  (uncertainty sampling).  ``orderBy().limit(k)`` compiles to
  ``TakeOrderedAndProject``: each partition keeps a k-row heap and the
  driver merges k-row samples — no global sort, no full-data exchange.
  That is the only global-top-k shape that survives a 10^12-pair stream
  (same physical plan the CEP meta-blocking prune relies on,
  pipeline/metablocking.py:209).
* ``uncertainty_per_block`` — a per-stratum budget via one row_number
  window partitioned by the stratum key, so dense boundary regions can't
  starve sparse ones.  One hash exchange on the stratum key, codegen
  window, filter — no Python.
* ``disagreement_pairs``    — query-by-committee: pairs where the
  scorer committee (hamming gate, Jaro-Winkler gate, edit-similarity
  gate, ...) splits its vote.  Pure boolean algebra over columns the
  scored frame already carries; a disagreeing committee marks exactly
  the pairs where the hybrid-alpha blend (scoring.py:113) is doing real
  arbitration rather than rubber-stamping.

Reference anchor: hexhamming exposes a *fixed* within-distance predicate
(check_hexstrings_within_dist, python_hexhamming.cc:62-64); picking WHICH
threshold to fix is the calibration problem these selectors feed.  The
threshold sweep (pipeline/metrics.py) scores every candidate cut; this
module routes labels to the pairs that discriminate between those cuts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def uncertainty_pairs(
    scored: DataFrame,
    threshold: float,
    k: int,
    score_col: str = "score",
    tie_cols: Sequence[str] = ("conv_id_a", "conv_id_b"),
) -> DataFrame:
    """Global margin sampling: the k scored pairs closest to ``threshold``.

    Output = input columns + ``margin`` (|score - threshold|, double),
    exactly k rows (fewer iff the input has fewer), deterministic under
    ties via ``tie_cols`` ascending.

    Scale shape: ``orderBy(margin, *ties).limit(k)`` is planned as
    TakeOrderedAndProject — per-partition k-row heaps, one driver merge of
    ~num_partitions * k rows.  k is a labeling budget (10^2..10^5), so the
    merge is trivially driver-safe even when ``scored`` has 10^12 rows.
    tests/test_active.py pins this plan shape.
    """
    margin = F.abs(F.col(score_col).cast("double") - F.lit(float(threshold)))
    order = [F.col("margin").asc()] + [F.col(c).asc() for c in tie_cols]
    return scored.withColumn("margin", margin).orderBy(*order).limit(int(k))


def uncertainty_per_block(
    scored: DataFrame,
    threshold: float,
    k_per_block: int,
    block_col: str,
    score_col: str = "score",
    tie_cols: Sequence[str] = ("conv_id_a", "conv_id_b"),
) -> DataFrame:
    """Stratified margin sampling: up to ``k_per_block`` boundary pairs per
    ``block_col`` stratum (language, source, shard, blocking key...).

    Global top-k alone concentrates the budget in whatever stratum happens
    to be densest near the boundary; the per-stratum variant guarantees
    every stratum surfaces its own hard cases.  One exchange on the
    stratum key, then a codegen row_number window and a filter — the same
    rank-and-cut shape as the CNP prune (pipeline/metablocking.py:172).

    Output = input columns + ``margin`` + ``sel_rank`` (1-based rank within
    the stratum).
    """
    margin = F.abs(F.col(score_col).cast("double") - F.lit(float(threshold)))
    w = Window.partitionBy(block_col).orderBy(
        F.col("margin").asc(), *[F.col(c).asc() for c in tie_cols]
    )
    return (
        scored.withColumn("margin", margin)
        .withColumn("sel_rank", F.row_number().over(w))
        .where(F.col("sel_rank") <= F.lit(int(k_per_block)))
    )


def disagreement_pairs(
    scored: DataFrame,
    votes: Sequence[Column],
    min_yes: int = 1,
) -> DataFrame:
    """Query-by-committee: keep pairs where the committee splits.

    ``votes`` is a sequence of boolean Columns over ``scored`` — one vote
    per committee member, e.g.::

        disagreement_pairs(scored, [
            F.col("hamming_dist") <= 20,          # A3's within-dist gate
            F.col("jw") >= 0.90,                  # string scorer
            F.col("score") >= 0.85,               # calibrated blend
        ])

    A pair is selected when the yes-count is in [min_yes, n_votes - 1]:
    at least one member says match AND at least one says non-match.
    Unanimous pairs (either way) are the ones labeling teaches us least
    about.  Output = input + ``n_yes`` (int) over the surviving rows.

    Pure Catalyst: each vote is a codegen boolean, the count is an integer
    add — no shuffle, no Python, safe to fuse into the scoring stage's
    output scan at any scale.
    """
    n = len(votes)
    if n < 2:
        raise ValueError("committee needs >= 2 votes to disagree")
    if not (1 <= min_yes <= n - 1):
        raise ValueError(f"min_yes must be in [1, {n - 1}], got {min_yes}")
    yes = sum(
        (F.when(v, F.lit(1)).otherwise(F.lit(0)) for v in votes), F.lit(0)
    ).cast("int")
    out = scored.withColumn("n_yes", yes)
    return out.where(
        (F.col("n_yes") >= F.lit(int(min_yes))) & (F.col("n_yes") <= F.lit(n - 1))
    )
