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
