"""B11 — the 1-vs-many probe query: A4 (check_bytes_arrays_within_dist,
python_hexhamming.cc:246-284) as a distributed service.

The reference scans a packed byte buffer sequentially and returns the FIRST
index within max_dist (cc:276-283). Distributed, "first" is an ordering
property, not a scan property: filter candidates within distance, take
min(idx) — an order-free aggregation that Catalyst executes with partial
(map-side) min, no sort. The probe is a one-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import columns as C


def first_match_index(candidates: DataFrame, probe_sig: bytes, max_dist: int) -> DataFrame:
    """candidates(idx long, sig binary) → one row (first_idx long); -1 when
    no candidate is within max_dist (cc:283)."""
    probed = candidates.withColumn(
        "dist", C.hamming_bytes(F.col("sig"), F.lit(probe_sig))
    )
    return probed.where(F.col("dist") <= F.lit(max_dist)).agg(
        F.coalesce(F.min("idx"), F.lit(-1)).alias("first_idx")
    )


def _hex_dist(a, b):
    """Hamming distance between two 64-hex-char signature columns, pure
    codegen: 8 x (conv substring -> long, XOR, bit_count). The JVM twin of
    columns.hamming_hex for the fixed 256-bit pipeline width."""
    from .scoring import _CHUNK_HEX, N_CHUNKS

    d = None
    for i in range(N_CHUNKS):
        ca = F.conv(F.substring(a, i * _CHUNK_HEX + 1, _CHUNK_HEX), 16, 10).cast("long")
        cb = F.conv(F.substring(b, i * _CHUNK_HEX + 1, _CHUNK_HEX), 16, 10).cast("long")
        t = F.bit_count(ca.bitwiseXOR(cb))
        d = t if d is None else d + t
    return d.cast("long")


def reps_with_radius(clusters: DataFrame, signatures: DataFrame) -> DataFrame:
    """Cluster representatives (canonicalize.representative_signature)
    plus each cluster's RADIUS: max hamming distance from the
    representative to any member. The radius is what makes two-stage
    probing EXACT (see probe_clusters) — build this once per corpus
    snapshot and reuse it for every probe.

    Output: (cluster_id, sig_hex, n_members, radius). One members-to-rep
    join keyed on cluster_id + one max aggregation."""
    from . import canonicalize

    reps = canonicalize.representative_signature(clusters, signatures)
    members = clusters.join(
        signatures.select("conv_id", F.col("sig_hex").alias("_member_hex")),
        "conv_id",
    )
    radii = (
        members.join(
            reps.select("cluster_id", F.col("sig_hex").alias("_rep_hex")),
            "cluster_id",
        )
        .groupBy("cluster_id")
        .agg(F.max(_hex_dist(F.col("_member_hex"), F.col("_rep_hex"))).alias("radius"))
    )
    return reps.select("cluster_id", "sig_hex", "n_members").join(radii, "cluster_id")


def probe_clusters(
    reps: DataFrame,
    clusters: DataFrame,
    signatures: DataFrame,
    probe_sig_hex: str,
    max_dist: int,
) -> DataFrame:
    """EXACT two-stage 1-vs-many search — B11's probe made sublinear in
    corpus size by the cluster structure:

    stage 1 (screen): keep clusters with
        dist(probe, rep) <= max_dist + radius.
    Hamming distance is a metric, so for any member m of a cluster with
    representative r: dist(probe, m) >= dist(probe, r) - dist(r, m)
    >= dist(probe, r) - radius. A cluster failing the screen therefore
    cannot contain ANY member within max_dist — the screen is lossless,
    whatever the clustering quality (a bad clustering only weakens the
    pruning, never the answer).

    stage 2 (verify): scan only surviving clusters' members with the
    exact predicate dist(probe, member) <= max_dist (A3 semantics,
    python_hexhamming.cc:62-64).

    Both stages are codegen projections + filters; the member scan reaches
    the signatures table through a semi-join on cluster_id, so non-
    surviving clusters' members are never read past the join. Output:
    (conv_id, cluster_id, dist), the exact within-distance set.
    """
    if len(probe_sig_hex) != 64:
        raise ValueError(
            f"probe_sig_hex must be 64 hex chars (256 bits), got {len(probe_sig_hex)}"
        )
    probe = F.lit(probe_sig_hex.lower())
    survivors = reps.where(
        _hex_dist(F.col("sig_hex"), probe) <= F.lit(max_dist) + F.col("radius")
    ).select("cluster_id")
    members = clusters.join(survivors, "cluster_id", "left_semi").join(
        signatures.select("conv_id", "sig_hex"), "conv_id"
    )
    return members.withColumn("dist", _hex_dist(F.col("sig_hex"), probe)).where(
        F.col("dist") <= F.lit(max_dist)
    ).select("conv_id", "cluster_id", "dist")
