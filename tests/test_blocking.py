"""B4/B5 blocking semantics: exactly-once pair emission, oversize-block
salt-chaining (skew handling that preserves cluster connectivity instead
of dropping mega-blocks), and parity with a brute-force band oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline import blocking, clustering


def _sigs_df(spark, rows):
    """rows: list of (conv_id, sig_hex); canon is irrelevant to blocking."""
    return spark.createDataFrame(
        [(cid, h, "canon-" + cid) for cid, h in rows],
        "conv_id string, sig_hex string, canon string",
    )


def _hex(i: int) -> str:
    return f"{i:064x}"


def test_pairs_match_bruteforce_band_oracle(spark):
    """With no oversize blocks, candidate_pairs must equal the distinct
    set of pairs sharing >=1 band (brute-force oracle via band_projection
    + self-join + distinct)."""
    import random

    rng = random.Random(11)
    rows = []
    # 40 random sigs + planted near-dup groups sharing high bands
    for i in range(40):
        rows.append((f"c{i:03d}", _hex(rng.getrandbits(256))))
    base = rng.getrandbits(256)
    for i in range(5):  # 5 sigs differing only in the last hex char
        rows.append((f"d{i:03d}", _hex((base & ~0xF) | i)))
    sigs = _sigs_df(spark, rows)

    pairs, _ = blocking.candidate_pairs(sigs, max_block=2000)
    got = {(r.conv_id_a, r.conv_id_b) for r in pairs.collect()}

    bands = blocking.band_projection(sigs)
    a, b = bands.alias("a"), bands.alias("b")
    want = {
        (r.x, r.y)
        for r in a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.conv_id") < F.col("b.conv_id")),
        )
        .select(F.col("a.conv_id").alias("x"), F.col("b.conv_id").alias("y"))
        .distinct()
        .collect()
    }
    assert got == want
    # exactly-once: no duplicate rows either
    assert pairs.count() == len(got)


def test_oversize_block_salt_chain_recovers_cluster(spark):
    """VERDICT r1 #2 done-criterion: a 5000-member near-duplicate cluster
    with max_block=2000 must still come out as ONE connected cluster (the
    old stop-band policy silently dropped it), with O(n) chain pairs, not
    O(n^2), and no duplicate pair rows."""
    n = 5000
    rows = [(f"m{i:05d}", _hex(0xABCDEF)) for i in range(n)]  # identical sigs
    sigs = _sigs_df(spark, rows)
    pairs, stats = blocking.candidate_pairs(sigs, max_block=2000)
    pairs = pairs.persist()

    n_pairs = pairs.count()
    # a path needs >= n-1 edges; salt-chaining emits ~n per block, never n^2/2
    assert n - 1 <= n_pairs <= 4 * n, n_pairs
    # no duplicates
    assert pairs.groupBy("conv_id_a", "conv_id_b").count().where("count > 1").count() == 0
    # all 16 blocks flagged as skipped->salted in stats
    assert stats.where("skipped").count() == 16

    cc, _ = clustering.connected_components(pairs)
    comp = cc.agg(F.countDistinct("cluster_id").alias("k"), F.count("*").alias("n")).collect()[0]
    assert comp["k"] == 1 and comp["n"] == n
    pairs.unpersist()


def test_oversize_and_normal_blocks_coexist(spark):
    """Mixing a mega-block with ordinary near-dup pairs must keep the
    ordinary pairs exactly as the brute-force oracle gives them, add chain
    pairs for the mega-block, and emit nothing twice."""
    import random

    rng = random.Random(5)
    mega = [(f"m{i:04d}", _hex(0x1234)) for i in range(30)]
    normals = []
    base = rng.getrandbits(256)
    for i in range(6):
        normals.append((f"n{i:02d}", _hex((base & ~0xF) | i)))
    for i in range(20):
        normals.append((f"r{i:02d}", _hex(rng.getrandbits(256))))
    sigs = _sigs_df(spark, mega + normals)

    pairs, stats = blocking.candidate_pairs(sigs, max_block=10)
    pairs = pairs.persist()
    assert pairs.groupBy("conv_id_a", "conv_id_b").count().where("count > 1").count() == 0

    got = {(r.conv_id_a, r.conv_id_b) for r in pairs.collect()}
    # normal-only pairs (both sides n/r) must match the brute-force oracle
    # (none of the n/r sigs share a band with the mega sig by construction
    # probability; verify via oracle anyway)
    bands = blocking.band_projection(sigs)
    a, b = bands.alias("a"), bands.alias("b")
    brute = {
        (r.x, r.y)
        for r in a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.conv_id") < F.col("b.conv_id")),
        )
        .select(F.col("a.conv_id").alias("x"), F.col("b.conv_id").alias("y"))
        .distinct()
        .collect()
    }
    brute_normal = {p for p in brute if not (p[0].startswith("m") and p[1].startswith("m"))}
    got_normal = {p for p in got if not (p[0].startswith("m") and p[1].startswith("m"))}
    assert got_normal == brute_normal

    # the mega block is connected through chain pairs
    mega_pairs = [p for p in got if p[0].startswith("m") and p[1].startswith("m")]
    assert len(mega_pairs) >= 29  # spanning tree of 30 members
    cc, _ = clustering.connected_components(pairs)
    mega_cluster = (
        cc.where(F.col("conv_id").startswith("m"))
        .agg(F.countDistinct("cluster_id").alias("k"), F.count("*").alias("n"))
        .collect()[0]
    )
    assert mega_cluster["k"] == 1 and mega_cluster["n"] == 30
    pairs.unpersist()


def test_band_val_int_matches_hex_substring(spark):
    """The integer band values (bit slices of the chunk longs) must agree
    with the hex-substring band projection for every band."""
    import random

    rng = random.Random(3)
    rows = [(f"c{i:02d}", _hex(rng.getrandbits(256))) for i in range(8)]
    sigs = _sigs_df(spark, rows)

    chunk_cols = [c.alias(f"c{i}") for i, c in enumerate(blocking.sig_chunks_raw())]
    band_vals = F.array(
        *[blocking._band_val_int(b, 16) for b in range(16)]
    )
    ints = (
        sigs.select("conv_id", "sig_hex", *chunk_cols)
        .select("conv_id", "sig_hex", F.posexplode(band_vals).alias("band_id", "iv"))
    )
    both = ints.withColumn(
        "hv", F.conv(F.expr("substring(sig_hex, band_id*4 + 1, 4)"), 16, 10).cast("long")
    )
    assert both.where(F.col("iv") != F.col("hv")).count() == 0


def test_randomized_exactly_once_and_connectivity(spark):
    """Randomized invariant sweep over the whole B4/B5 surface: for random
    signature populations (mixing near-dup families and noise) and random
    max_block values that force arbitrary subsets of blocks through the
    salt-chain branch, the wide pair stream must (a) never emit a pair
    twice, (b) emit a subset of the brute-force band-collision pairs, and
    (c) preserve the band-collision graph's connected components exactly
    (chaining may thin edges inside an oversize block but never splits or
    merges components)."""
    import random

    rng = random.Random(20260818)
    for trial in range(4):
        n_fam = rng.randint(2, 5)
        rows = []
        for f in range(n_fam):
            base = rng.getrandbits(256)
            size = rng.choice([1, 2, 3, 8, 15])
            for m in range(size):
                v = base
                for _ in range(rng.randint(0, 2)):
                    v ^= 1 << rng.randrange(256)
                rows.append((f"c{f:02d}_{m:03d}", _hex(v)))
        sigs = _sigs_df(spark, rows)
        max_block = rng.choice([2, 3, 5, 2000])

        pairs = blocking.candidate_pairs(sigs, max_block=max_block)[0].persist()
        emitted = [(r.conv_id_a, r.conv_id_b) for r in pairs.collect()]
        assert len(emitted) == len(set(emitted)), (trial, max_block)
        assert all(a < b for a, b in emitted)

        bands = blocking.band_projection(sigs)
        brute = (
            bands.alias("x")
            .join(
                bands.alias("y"),
                (F.col("x.band_id") == F.col("y.band_id"))
                & (F.col("x.band_val") == F.col("y.band_val"))
                & (F.col("x.conv_id") < F.col("y.conv_id")),
            )
            .select(
                F.col("x.conv_id").alias("a"), F.col("y.conv_id").alias("b")
            )
            .distinct()
        )
        want_pairs = {(r.a, r.b) for r in brute.collect()}
        assert set(emitted) <= want_pairs, (trial, max_block)

        def components(edge_list):
            parent = {}

            def find(x):
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in edge_list:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            return {
                frozenset(k for k in parent if find(k) == r)
                for r in {find(k) for k in parent}
            }

        assert components(emitted) == components(want_pairs), (trial, max_block)
        pairs.unpersist()


def test_n_bands_64_ansi_safe(spark):
    """ADVICE r2 (medium): `shiftleft(1L, band_id) - 1` overflowed under
    ANSI mode at band_id=63, so n_bands=64 — the config _match_mask
    explicitly supports — failed at runtime. The mask is now a pure bit
    expression (bitwise_not(shiftleft(-1L, band_id))). This test runs both
    the normal branch AND the oversize/banned branch (identical sigs ban
    every band incl. 63, putting Long.MinValue through the banned-mask sum)
    at n_bands=64 and checks the band oracle / connectivity still hold."""
    import random

    rng = random.Random(64)
    # normal branch: planted group agreeing on the last 4-bit band only
    base = rng.getrandbits(256)
    rows = [(f"p{i}", _hex((base & 0xF) | (rng.getrandbits(252) << 4))) for i in range(4)]
    rows += [(f"r{i:02d}", _hex(rng.getrandbits(256))) for i in range(20)]
    sigs = _sigs_df(spark, rows)
    pairs, _ = blocking.candidate_pairs(sigs, n_bands=64, max_block=2000)
    got = {(r.conv_id_a, r.conv_id_b) for r in pairs.collect()}
    bands = blocking.band_projection(sigs, n_bands=64)
    a, b = bands.alias("a"), bands.alias("b")
    want = {
        (r.x, r.y)
        for r in a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.conv_id") < F.col("b.conv_id")),
        )
        .select(F.col("a.conv_id").alias("x"), F.col("b.conv_id").alias("y"))
        .distinct()
        .collect()
    }
    assert got == want and len(got) >= 6  # planted group => >= C(4,2) pairs

    # oversize branch: identical sigs -> all 64 bands oversize, banned mask
    # has bit 63 set; chain must still connect the block into one component
    mega = _sigs_df(spark, [(f"m{i:03d}", _hex(0x5A5A)) for i in range(40)])
    mpairs, mstats = blocking.candidate_pairs(mega, n_bands=64, max_block=10)
    mpairs = mpairs.persist()
    assert mstats.where("skipped").count() == 64
    assert mpairs.groupBy("conv_id_a", "conv_id_b").count().where("count > 1").count() == 0
    cc, _ = clustering.connected_components(mpairs)
    comp = cc.agg(F.countDistinct("cluster_id").alias("k"), F.count("*").alias("n")).collect()[0]
    assert comp["k"] == 1 and comp["n"] == 40
    mpairs.unpersist()


def test_union_candidates_multipass(spark):
    from hexspark.pipeline.blocking import union_candidates

    lsh = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "conv_id_a string, conv_id_b string"
    )
    snm = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("a", "b")],  # dup within one pass too
        "conv_id_a string, conv_id_b string",
    )
    out = union_candidates({"lsh": lsh, "snm": snm})
    got = {
        (r["conv_id_a"], r["conv_id_b"]): (list(r["passes"]), r["n_passes"])
        for r in out.collect()
    }
    assert got == {
        ("a", "b"): (["lsh", "snm"], 2),
        ("a", "c"): (["lsh"], 1),
        ("c", "d"): (["snm"], 1),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        union_candidates({})
