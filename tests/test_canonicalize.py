"""Survivorship (pipeline/canonicalize): golden-record selection and
attribute fusion after clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.canonicalize import fuse_attributes, golden_records


@pytest.fixture(scope="module")
def clustered(spark):
    clusters = spark.createDataFrame(
        [
            ("a", "c1"), ("b", "c1"), ("c", "c1"),
            ("d", "c2"), ("e", "c2"),
            ("f", "c3"),
        ],
        "conv_id string, cluster_id string",
    )
    records = spark.createDataFrame(
        [
            # conv_id, name, lang, n_chars
            ("a", "Alice Smith", "en", 40),
            ("b", "alice smith", "en", 55),   # longest in c1
            ("c", "A. Smith", "de", 55),      # ties b on n_chars; id tiebreak
            ("d", "Bob", None, 10),
            ("e", "Robert", "fr", 9),
            ("f", "Carol", "en", 30),
        ],
        "conv_id string, name string, lang string, n_chars int",
    )
    return clusters, records


def test_golden_records_preference_order(spark, clustered):
    clusters, records = clustered
    out = golden_records(
        clusters, records, "conv_id", order_by=[F.desc("n_chars")]
    )
    got = {r["cluster_id"]: (r["conv_id"], r["n_members"]) for r in out.collect()}
    # c1: b and c tie at 55 chars; ascending conv_id tiebreak picks b
    assert got == {"c1": ("b", 3), "c2": ("d", 2), "c3": ("f", 1)}
    # all record attributes survive on the golden row
    names = {r["cluster_id"]: r["name"] for r in out.collect()}
    assert names["c1"] == "alice smith"


def test_golden_records_one_row_per_cluster(spark, clustered):
    clusters, records = clustered
    out = golden_records(clusters, records, "conv_id", order_by=[F.asc("name")])
    assert out.count() == clusters.select("cluster_id").distinct().count()


def test_fuse_attributes_modal_value(spark, clustered):
    clusters, records = clustered
    out = fuse_attributes(clusters, records, "conv_id", fields=["lang", "n_chars"])
    got = {r["cluster_id"]: (r["fused_lang"], r["fused_n_chars"]) for r in out.collect()}
    # c1 langs: en, en, de -> modal en; n_chars: 40, 55, 55 -> modal 55
    assert got["c1"] == ("en", 55)
    # c2 langs: NULL, fr -> nulls ignored -> fr; n_chars 10 vs 9 tie -> min 9
    assert got["c2"] == ("fr", 9)
    assert got["c3"] == ("en", 30)


def test_fuse_attributes_all_null_field(spark):
    clusters = spark.createDataFrame(
        [("a", "c1"), ("b", "c1")], "conv_id string, cluster_id string"
    )
    records = spark.createDataFrame(
        [("a", None), ("b", None)], "conv_id string, tool string"
    )
    out = fuse_attributes(clusters, records, "conv_id", fields=["tool"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["fused_tool"] is None


def test_fusion_deterministic_under_repartition(spark, clustered):
    clusters, records = clustered
    a = fuse_attributes(clusters, records, "conv_id", ["lang"]).collect()
    b = fuse_attributes(
        clusters.repartition(7), records.repartition(5), "conv_id", ["lang"]
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# Representative (majority-vote) signatures
# ---------------------------------------------------------------------------


def _sig_rows(spark, sigs: dict[str, bytes], clusters: dict[str, str]):
    sig_df = spark.createDataFrame(
        [(k, v.hex()) for k, v in sigs.items()], "conv_id string, sig_hex string"
    )
    cl_df = spark.createDataFrame(
        list(clusters.items()), "conv_id string, cluster_id string"
    )
    return sig_df, cl_df


def _majority(members: list[bytes]) -> bytes:
    import numpy as np

    mat = np.unpackbits(np.frombuffer(b"".join(members), dtype=np.uint8).reshape(len(members), 32), axis=1)
    votes = mat.sum(axis=0) * 2 > len(members)  # tie -> 0
    return np.packbits(votes.astype(np.uint8)).tobytes()


def test_representative_singleton_is_member(spark):
    from hexspark.pipeline.canonicalize import representative_signature

    import numpy as np

    rng = np.random.default_rng(7)
    sig = rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
    sig_df, cl_df = _sig_rows(spark, {"x": sig}, {"x": "x"})
    got = representative_signature(cl_df, sig_df).collect()
    assert len(got) == 1
    r = got[0]
    assert bytes(r["sig"]) == sig and r["sig_hex"] == sig.hex()
    assert r["n_members"] == 1


def test_representative_majority_and_tie_to_zero(spark):
    from hexspark.pipeline.canonicalize import representative_signature

    # 2-member cluster: every disagreeing bit is a tie -> 0; agreeing bits
    # survive. all-ones vs all-zeros -> all zeros.
    ones, zeros = b"\xff" * 32, b"\x00" * 32
    sig_df, cl_df = _sig_rows(
        spark, {"a": ones, "b": zeros}, {"a": "c", "b": "c"}
    )
    r = representative_signature(cl_df, sig_df).collect()[0]
    assert bytes(r["sig"]) == zeros and r["n_members"] == 2

    # 3 members: 2/3 majority wins per bit
    s1 = b"\xf0" * 32
    s2 = b"\xf0" * 16 + b"\x0f" * 16
    s3 = b"\xff" * 32
    sig_df, cl_df = _sig_rows(
        spark, {"a": s1, "b": s2, "c": s3}, {"a": "c", "b": "c", "c": "c"}
    )
    r = representative_signature(cl_df, sig_df).collect()[0]
    assert bytes(r["sig"]) == _majority([s1, s2, s3])


def test_representative_numpy_oracle_randomized(spark):
    from hexspark.pipeline.canonicalize import representative_signature

    import numpy as np

    rng = np.random.default_rng(0xC1)
    sigs, clusters, want = {}, {}, {}
    for c in range(8):
        n = int(rng.integers(1, 7))
        members = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(n)]
        for i, m in enumerate(members):
            cid = f"cl{c}"
            sigs[f"{cid}_m{i}"] = m
            clusters[f"{cid}_m{i}"] = cid
        want[f"cl{c}"] = (_majority(members), n)
    sig_df, cl_df = _sig_rows(spark, sigs, clusters)
    got = {
        r["cluster_id"]: (bytes(r["sig"]), r["n_members"])
        for r in representative_signature(cl_df, sig_df).collect()
    }
    assert got == want


def test_representative_minimizes_summed_hamming(spark):
    """Per-bit majority is the L1 medoid of the hamming cube: the rep's
    summed distance to the members is <= any member's (so probing against
    the rep is at least as central as probing any real record)."""
    from hexspark.pipeline.canonicalize import representative_signature

    import numpy as np

    rng = np.random.default_rng(5)
    members = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes() for _ in range(9)]
    sigs = {f"m{i}": m for i, m in enumerate(members)}
    clusters = {k: "c" for k in sigs}
    sig_df, cl_df = _sig_rows(spark, sigs, clusters)
    rep = bytes(representative_signature(cl_df, sig_df).collect()[0]["sig"])

    def hd(x, y):
        return bin(int.from_bytes(x, "big") ^ int.from_bytes(y, "big")).count("1")

    rep_cost = sum(hd(rep, m) for m in members)
    for m in members:
        assert rep_cost <= sum(hd(m, o) for o in members)
