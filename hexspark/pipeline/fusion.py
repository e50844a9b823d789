"""Truth discovery / data fusion: resolve conflicting attribute claims from
sources of unequal reliability (the stage AFTER clustering and survivorship
in a record-linkage pipeline: cluster members cite values from different
source systems; which value is true?).

Algorithm: fixed-round iterative weighted voting, the integer-exact core of
the TruthFinder / Investment family (Yin et al., "Truth Discovery with
Multiple Conflicting Information Providers"; Dong & Srivastava, "Big Data
Integration" ch. 4), reduced to sums so a SQL oracle can replay it
bit-for-bit:

  round 0   support0(entity, attr, value) = #distinct sources claiming it
  trust     trust_r(source) = sum of support_r over the source's claims —
            a source that sides with consensus accrues trust
  round r+1 support_{r+1}(value) = sum of trust_r over claiming sources
  answer    per (entity, attr): the value with max final support,
            ties broken by min value (deterministic)

Everything is a BIGINT sum of counts, so Spark and any SQL engine agree
exactly — no float vote shares, no summation-order sensitivity. Trust
magnitudes grow ~|claims| per round; two rounds at 10^9 claims stays well
inside int64 (10^18). Beyond that, normalize trust to doubles per round and
accept oracle-approximate results — the plan shape is unchanged.

Plan shape, all Catalyst: each round is two hash aggregates (claims keyed on
(entity, attr, value), then on source) plus one broadcast-or-shuffle join of
the tiny trust table back onto claims; the final answer is one max_by
aggregate keyed on (entity, attr). No UDFs, no iteration on the driver
beyond a fixed small loop emitting static plan stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def truth_discovery(
    claims: DataFrame,
    entity_col: str,
    attr_col: str,
    value_col: str,
    source_col: str,
    rounds: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Resolve (entity, attr) -> value from conflicting per-source claims.

    Returns (resolved, trust):
      resolved  (entity, attr, value, votes) — the winning value per
                (entity, attr) with its final integer support
      trust     (source, trust) — the last round's per-source trust

    Duplicate (source, entity, attr, value) rows collapse to one claim so a
    source cannot stuff the ballot by repetition.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    c = claims.select(
        F.col(entity_col).alias("entity"),
        F.col(attr_col).alias("attr"),
        F.col(value_col).alias("value"),
        F.col(source_col).alias("source"),
    ).distinct()

    # round 0: unweighted — every source has trust 1
    support = c.groupBy("entity", "attr", "value").agg(
        F.count(F.lit(1)).cast("long").alias("votes")
    )
    trust = None
    for _ in range(rounds - 1):
        trust = (
            c.join(support, ["entity", "attr", "value"])
            .groupBy("source")
            .agg(F.sum("votes").alias("trust"))
        )
        support = (
            c.join(F.broadcast(trust), "source")
            .groupBy("entity", "attr", "value")
            .agg(F.sum("trust").alias("votes"))
        )
    if trust is None:
        trust = c.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("trust"))

    # winner = max votes, ties broken by MIN value: max votes first, then
    # min value among holders of that max (two combinable aggregates — a
    # single max_by(value, struct(votes, value)) would tie-break by MAX
    # value instead, and struct(votes, -value) is not expressible for
    # string values).
    top = support.groupBy("entity", "attr").agg(F.max("votes").alias("votes"))
    resolved = (
        support.join(top, ["entity", "attr", "votes"])
        .groupBy("entity", "attr", "votes")
        .agg(F.min("value").alias("value"))
        .select("entity", "attr", "value", "votes")
    )
    return resolved, trust
