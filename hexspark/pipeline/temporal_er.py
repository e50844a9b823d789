"""Temporal record linkage — time-decayed match evidence for entities
that DRIFT (Li, Dong, Maurino, Srivastava, VLDB 2011 "Linking temporal
records"): the transcripts input schema carries a timestamp per turn, and
two conversations months apart are weaker evidence in BOTH directions —
agreement decays (values get reused by other entities over time: a
coincidental near-identical conversation far apart in time is less
probative of same-entity) and disagreement decays (the same entity's
style/content drifts: textual distance across a long gap is less
probative of different-entity).

This module implements the practical reduction both decays share:
log-odds evidence shrinks toward NEUTRAL (weight 0) with the time gap,

    decayed_weight = weight * 2^(-|t_a - t_b| / half_life)

applied to any per-pair log-odds weight column — the fixed hamming+JW
blend's margin or pipeline/fs.py's Fellegi-Sunter match weight (FS
weights are already log2 odds, so exponential-in-time shrinkage is
literally multiplying the likelihood-ratio exponent). A pair at gap 0
keeps its full evidence; at one half-life it carries half; the decision
threshold stays FIXED while the evidence moves, which is the form that
composes with the existing classify/cluster stages unchanged.

Everything is one codegen projection over the pair stream (timestampdiff
for the gap — wall-clock NTZ arithmetic, the event_sessions discipline;
pow/multiply for the decay): no shuffle, no Python, no new exchange at
any scale. Clustering on decayed edges then uses the standard threshold
gate, so the full temporal pipeline is filter-pushdown-friendly.

pytest-pinned (float pow), identical-arithmetic pure-Python oracle; the
fixture test pins the DEFINING behavior: at one fixed threshold, a
close-in-time true pair survives while an equally-similar far-apart
coincidence is rejected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000


def time_gap_days(ts_a_col: str, ts_b_col: str):
    """Absolute wall-clock gap in fractional days between two timestamp
    columns (names, not Column objects — timestampdiff is reached via
    F.expr): microsecond-exact integer difference, one IEEE division,
    works on TIMESTAMP and TIMESTAMP_NTZ alike with no session-timezone
    dependence (the event_sessions discipline)."""
    us = F.abs(F.expr(f"timestampdiff(MICROSECOND, {ts_a_col}, {ts_b_col})"))
    return us.cast("double") / F.lit(float(_US_PER_DAY))


def decay_weights(
    pairs: DataFrame,
    weight_col: str = "weight",
    ts_a_col: str = "ts_a",
    ts_b_col: str = "ts_b",
    half_life_days: float = 90.0,
    out_col: str = "decayed_weight",
) -> DataFrame:
    """Shrink per-pair log-odds evidence toward 0 with the pair's time gap.

    Adds gap_days and out_col = weight * 2^(-gap_days / half_life_days).
    Pure projection; sign is preserved (positive and negative evidence
    both decay toward neutral — the two-sided Li et al. behavior).
    """
    if not half_life_days > 0:
        raise ValueError(f"half_life_days must be > 0 (got {half_life_days})")
    gap = time_gap_days(ts_a_col, ts_b_col)
    return pairs.withColumn("gap_days", gap).withColumn(
        out_col,
        F.col(weight_col)
        * F.pow(F.lit(2.0), -F.col("gap_days") / F.lit(float(half_life_days))),
    )


def temporal_match_edges(
    pairs: DataFrame,
    threshold: float,
    weight_col: str = "weight",
    ts_a_col: str = "ts_a",
    ts_b_col: str = "ts_b",
    half_life_days: float = 90.0,
) -> DataFrame:
    """Match edges under time-decayed evidence: decay, then gate at the
    FIXED threshold. Same output contract as scoring.py's match filter
    (the decayed weight and gap ride along for review queues), so the
    standard clustering stages consume it unchanged."""
    d = decay_weights(
        pairs, weight_col, ts_a_col, ts_b_col, half_life_days
    )
    return d.where(F.col("decayed_weight") >= F.lit(float(threshold)))
