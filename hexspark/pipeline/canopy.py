"""Canopy clustering as a blocking pass (McCallum, Nigam & Ungar, KDD 2000
— public paper): overlapping coarse groups built with a CHEAP similarity so
the expensive comparison only ever runs inside a canopy.

Semantics (similarity form — thresholds are similarities, so the TIGHT
threshold is the HIGHER one): visit records in a deterministic order; a
record still in the candidate pool becomes a canopy CENTER; every record
with cheap similarity >= t_loose to the center joins its canopy (records
join ANY number of canopies — canopies overlap, that is the recall
guarantee), and records with similarity >= t_tight are REMOVED from the
pool (they are "close enough" to an existing center to never need their
own). Candidate pairs for the expensive scorer are exactly the pairs
sharing at least one canopy.

Distributed shape — no sequential pass, no driver-side pool:

1. The cheap similarity graph at the LOOSE threshold comes from the exact
   prefix-filter set-similarity join (ops/setjoin.prefix_sim_join) — an
   inverted-index equi-join, never an all-pairs scan. One stream serves
   both thresholds: the tight subgraph is a filter over it.
2. The sequential center set is the lexicographically-first maximal
   independent set of the TIGHT subgraph under the deterministic md5
   priority (the same argument that makes parallel KwikCluster exact:
   a record is a center iff no earlier-priority record within t_tight is
   one). Computed by the shared clustering._greedy_mis round engine;
   records with no tight neighbor are centers by definition.
3. Membership and pair emission are equi-joins on the center id.

Scale: step 1 is the standard prefix-filter join; step 2's rounds are
node-keyed aggregations over the tight subgraph only (the small one);
step 3 shuffles on center ids. Canopy sizes are bounded by t_loose —
the classic tuning story — and a `max_canopy` cap drops degenerate
canopies the way every other blocking pass here caps hot blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ops.setjoin import prefix_sim_join
from .clustering import _greedy_mis, _pivot_priority


def canopy_assignments(
    df: DataFrame,
    id_col: str,
    text: Column,
    t_loose: float,
    t_tight: float,
    measure: str = "jaccard",
    salt: str = "",
    max_iter: int = 40,
) -> DataFrame:
    """(center_id, rec_id, sim_milli) — every canopy membership, including
    each center's own (center, center, 1000) row. A record may appear
    under several centers (canopies overlap); every record appears at
    least once (uncovered records are their own centers, because the
    sequential pass would eventually reach them still in the pool).

    ``t_loose <= t_tight`` (similarities: tight = higher). ``sim_milli``
    is the cheap similarity as an exact integer in [0, 1000]."""
    if not 0.0 < t_loose <= t_tight <= 1.0:
        raise ValueError(
            f"need 0 < t_loose <= t_tight <= 1, got ({t_loose}, {t_tight})"
        )
    cheap = prefix_sim_join(df, id_col, text, threshold=t_loose, measure=measure)
    a, b = f"{id_col}_a", f"{id_col}_b"
    loose = cheap.select(
        F.col(a).alias("u"),
        F.col(b).alias("v"),
        F.round(F.col(measure) * 1000).cast("bigint").alias("sim_milli"),
    ).localCheckpoint(eager=True)
    tight = (
        loose.where(F.col("sim_milli") >= F.round(F.lit(t_tight) * 1000))
        .select(
            "u", _pivot_priority(F.col("u"), salt).alias("pu"),
            "v", _pivot_priority(F.col("v"), salt).alias("pv"),
        )
    )
    _, mis_rounds, _ = _greedy_mis(tight, max_iter, "canopy center selection")
    # full center set = rounds MIS + records never knocked out: records
    # with no tight edge at all, and tight-graph nodes whose neighbors
    # were all removed in earlier rounds (leftovers)
    all_ids = df.select(F.col(id_col).alias("u")).distinct()
    knocked_out = (
        tight.select("u", "v")
        .unionByName(tight.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .join(mis_rounds.select(F.col("u").alias("v")), "v", "left_semi")
        .select("u")
        .distinct()
    )
    centers = all_ids.join(knocked_out, "u", "left_anti").localCheckpoint(
        eager=True
    )
    sym_loose = loose.unionByName(
        loose.select(
            F.col("v").alias("u"), F.col("u").alias("v"), "sim_milli"
        )
    )
    members = sym_loose.join(centers, "u", "left_semi").select(
        F.col("u").alias("center_id"),
        F.col("v").alias("rec_id"),
        "sim_milli",
    )
    own = centers.select(
        F.col("u").alias("center_id"),
        F.col("u").alias("rec_id"),
        F.lit(1000).cast("bigint").alias("sim_milli"),
    )
    return members.unionByName(own)


def canopy_pairs(
    df: DataFrame,
    id_col: str,
    text: Column,
    t_loose: float,
    t_tight: float,
    measure: str = "jaccard",
    salt: str = "",
    max_canopy: int | None = 200,
    out_a: str = "conv_id_a",
    out_b: str = "conv_id_b",
) -> DataFrame:
    """Candidate pairs from the canopy pass: records sharing >= 1 canopy,
    exactly once per pair (lower id on the a-side), with the number of
    shared canopies as provenance: (out_a, out_b, n_shared_canopies).

    ``max_canopy`` drops canopies larger than the cap BEFORE pairing —
    same hot-block discipline as token/phonetic/suffix passes; a pair
    co-members of both a monster canopy and a normal one survives through
    the normal one. Feed into blocking.union_candidates as one pass."""
    asg = canopy_assignments(
        df, id_col, text, t_loose, t_tight, measure=measure, salt=salt
    )
    if max_canopy is not None:
        ok = (
            asg.groupBy("center_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= F.lit(int(max_canopy)))
            .select("center_id")
        )
        asg = asg.join(ok, "center_id", "left_semi")
    left = asg.select("center_id", F.col("rec_id").alias(out_a))
    right = asg.select("center_id", F.col("rec_id").alias(out_b))
    return (
        left.join(right, "center_id")
        .where(F.col(out_a) < F.col(out_b))
        .groupBy(out_a, out_b)
        .agg(F.count(F.lit(1)).alias("n_shared_canopies"))
    )
