"""B4/B5 — LSH banding + explicit skew handling.

The 256-bit signature is cut into ``n_bands`` contiguous bands of
``256 / n_bands`` bits each. Two signatures within hamming distance d are
*guaranteed* to agree on at least one band whenever d < n_bands (pigeonhole
— the generalization of the reference's early-exit pruning idea,
python_hexhamming.cc:62-64, moved from inside the scalar loop up to the
plan level: prune pairs before scoring instead of mid-scoring).

Everything here is pure Catalyst: band values are substrings of sig_hex
(whole-stage codegen), candidates come from one self-equi-join on
(band_id, band_val), and pair dedup is a distinct on the pair key.

Skew (B5): hot band values — boilerplate conversations that share a band
value with thousands of others — would give one join key a quadratic pair
blowup. Handled explicitly, per the north rule:
  1. stop-band cap: band groups larger than ``max_block`` are dropped from
     candidate generation (each dropped group is observable in the returned
     stats DF). A conversation cluster that big agrees on *other* bands
     with near-certainty, and true mega-blocks are boilerplate by
     construction.
  2. AQE skew-join splitting remains enabled for residual imbalance
     (session.py sets spark.sql.adaptive.skewJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIG_HEX_CHARS = 64  # 256 bits


def band_projection(signatures: DataFrame, n_bands: int = 16) -> DataFrame:
    """signatures → bands(conv_id, band_id, band_val).

    band_val is the band's slice of sig_hex — a fixed-width hex substring,
    computed JVM-side (no UDF, no shuffle).
    """
    assert SIG_HEX_CHARS % n_bands == 0, "n_bands must divide 64"
    w = SIG_HEX_CHARS // n_bands
    slices = F.array(
        *[F.substring("sig_hex", i * w + 1, w) for i in range(n_bands)]
    )
    return signatures.select(
        "conv_id", F.posexplode(slices).alias("band_id", "band_val")
    )


def candidate_pairs(
    signatures: DataFrame,
    n_bands: int = 16,
    max_block: int = 2000,
) -> tuple[DataFrame, DataFrame]:
    """LSH-blocked candidate pairs.

    Returns (pairs, block_stats):
      pairs(conv_id_a, conv_id_b) with conv_id_a < conv_id_b, distinct
      block_stats(band_id, band_val, block_size, skipped) — lineage for the
      skew decision (every dropped block is visible, per north_rule's
      "skew handled explicitly").
    """
    bands = band_projection(signatures, n_bands)

    sizes = bands.groupBy("band_id", "band_val").agg(
        F.count(F.lit(1)).alias("block_size")
    )
    block_stats = sizes.withColumn("skipped", F.col("block_size") > F.lit(max_block))

    # block-size gate as a window over the band shuffle: ONE exchange on
    # (band_id, band_val) that the self-join below reuses for both sides
    # (ReusedExchange), instead of a separate sizes-aggregate + re-join of
    # the keep-list — which at scale is a second full shuffle of the band
    # table. Blocks of size 1 generate no pairs — dropped early.
    w = Window.partitionBy("band_id", "band_val")
    kept = (
        bands.withColumn("block_size", F.count(F.lit(1)).over(w))
        .where((F.col("block_size") <= max_block) & (F.col("block_size") > 1))
        .drop("block_size")
    )

    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.conv_id") < F.col("b.conv_id")),
        )
        .select(
            F.col("a.conv_id").alias("conv_id_a"),
            F.col("b.conv_id").alias("conv_id_b"),
        )
        .distinct()  # a pair agreeing on k bands must score once, not k times
    )
    return pairs, block_stats


def candidate_pairs_wide(
    signatures: DataFrame,
    n_bands: int = 16,
    max_block: int = 2000,
) -> tuple[DataFrame, DataFrame]:
    """LSH-blocked candidate pairs that CARRY both sides' signature chunks
    and canonical keys out of the band self-join.

    Plan-shape rationale (the 100TB-relevant one): the thin variant emits
    (conv_id_a, conv_id_b) and scoring must join the signatures table twice
    to re-attach fingerprints — three shuffles of the pair stream and, at
    sandbox scale, a broadcast-hash probe per pair row that measures an
    order of magnitude slower than the scoring kernel itself. Here the band
    rows carry (chunks, canon) into the self-join, so scoring becomes a
    pure narrow map stage: no attach joins, one dedup shuffle total.

    Returns (pairs_wide, block_stats); pairs_wide has conv_id_a/b,
    c{i}_a/b signature chunk longs, canon_a/b.
    """
    from .scoring import N_CHUNKS

    assert SIG_HEX_CHARS % n_bands == 0, "n_bands must divide 64"
    w = SIG_HEX_CHARS // n_bands
    slices = F.array(*[F.substring("sig_hex", i * w + 1, w) for i in range(n_bands)])
    chunk_cols = [c.alias(f"c{i}") for i, c in enumerate(sig_chunks_raw())]
    bands = signatures.select(
        "conv_id", "canon", *chunk_cols, F.posexplode(slices).alias("band_id", "band_val")
    )

    sizes = bands.groupBy("band_id", "band_val").agg(
        F.count(F.lit(1)).alias("block_size")
    )
    block_stats = sizes.withColumn("skipped", F.col("block_size") > F.lit(max_block))
    # window-based block gate: one exchange, reused by both self-join sides
    win = Window.partitionBy("band_id", "band_val")
    kept = (
        bands.withColumn("block_size", F.count(F.lit(1)).over(win))
        .where((F.col("block_size") <= max_block) & (F.col("block_size") > 1))
        .drop("block_size")
    )

    a = kept.alias("a")
    b = kept.alias("b")
    joined = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.conv_id") < F.col("b.conv_id")),
    ).select(
        F.col("a.conv_id").alias("conv_id_a"),
        F.col("b.conv_id").alias("conv_id_b"),
        F.col("a.canon").alias("canon_a"),
        F.col("b.canon").alias("canon_b"),
        *[F.col(f"a.c{i}").alias(f"c{i}_a") for i in range(N_CHUNKS)],
        *[F.col(f"b.c{i}").alias(f"c{i}_b") for i in range(N_CHUNKS)],
    )
    # one row per pair. The canon strings ride in the GROUP KEY (they are
    # identical across a pair's matching bands, so the grouping is still
    # by pair); only the fixed-width chunk longs are aggregated (max ==
    # any, payload identical). With every aggregate buffer fixed-width
    # this stays a HashAggregate — first()/any_value/max over strings
    # would force SortAggregate, a full sort of the pair stream.
    chunk_payload = [c for c in joined.columns if c.startswith("c")  and c not in ("conv_id_a", "conv_id_b", "canon_a", "canon_b")]
    pairs = joined.groupBy("conv_id_a", "conv_id_b", "canon_a", "canon_b").agg(
        *[F.max(c).alias(c) for c in chunk_payload]
    )
    return pairs, block_stats


def sig_chunks_raw():
    """The 8 x 32-bit chunk expressions of sig_hex without side suffix."""
    from .scoring import N_CHUNKS

    return [
        F.conv(F.substring("sig_hex", i * 8 + 1, 8), 16, 10).cast("long")
        for i in range(N_CHUNKS)
    ]
