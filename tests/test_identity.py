"""Persistent entity ids: bootstrap minting, id continuity under growth and
member-id churn, split (largest fragment keeps the id), merge (largest
constituent wins, loser retired with a destination), uniqueness invariants,
and idempotence."""

from __future__ import annotations

from hexspark.pipeline.identity import stable_entity_ids


def _cur(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, cluster_id string")


def _pri(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, entity_id string")


def _run(spark, cur, pri):
    a, r = stable_entity_ids(
        _cur(spark, cur), _pri(spark, pri) if pri is not None else None
    )
    return (
        {x.conv_id: x.entity_id for x in a.collect()},
        {x.entity_id: x.absorbed_into for x in r.collect()},
    )


def test_bootstrap_mints_min_member_ids(spark):
    got, ret = _run(spark, [("b", "c1"), ("a", "c1"), ("z", "c2")], None)
    assert got == {"a": "new:a", "b": "new:a", "z": "new:z"}
    assert ret == {}


def test_growth_and_churn_keep_the_id(spark):
    # entity E grew by a new member whose id is the new cluster min —
    # canonical cluster_id churns, entity id must not
    cur = [("a", "0new"), ("b", "0new"), ("0new", "0new")]
    pri = [("a", "E"), ("b", "E")]
    got, ret = _run(spark, cur, pri)
    assert got == {"a": "E", "b": "E", "0new": "E"}
    assert ret == {}


def test_split_largest_fragment_keeps_id(spark):
    cur = [("a", "cA"), ("b", "cA"), ("c", "cB")]
    pri = [("a", "E"), ("b", "E"), ("c", "E")]
    got, ret = _run(spark, cur, pri)
    assert got["a"] == got["b"] == "E"
    assert got["c"] == "new:c"
    assert ret == {}


def test_merge_largest_constituent_wins_and_loser_retires(spark):
    cur = [("a", "c1"), ("b", "c1"), ("c", "c1")]
    pri = [("a", "E1"), ("b", "E1"), ("c", "E2")]
    got, ret = _run(spark, cur, pri)
    assert got == {"a": "E1", "b": "E1", "c": "E1"}
    assert ret == {"E2": "E1"}


def test_no_entity_id_assigned_twice(spark):
    # two clusters both mostly made of E's members: only one keeps E
    cur = [("a", "cA"), ("b", "cA"), ("c", "cB"), ("d", "cB"), ("e", "cB")]
    pri = [(x, "E") for x in "abcde"]
    got, ret = _run(spark, cur, pri)
    vals = set(got.values())
    assert list(got.values()).count("E") in (2, 3)
    # the larger fragment (cB, 3 members) keeps E; cA mints fresh
    assert got["c"] == got["d"] == got["e"] == "E"
    assert got["a"] == got["b"] == "new:a"
    assert "E" in vals and ret == {}


def test_idempotent_when_nothing_changed(spark):
    cur = [("a", "c1"), ("b", "c1"), ("z", "c2")]
    pri = [("a", "E1"), ("b", "E1"), ("z", "E2")]
    got, ret = _run(spark, cur, pri)
    assert got == {"a": "E1", "b": "E1", "z": "E2"}
    assert ret == {}
    # applying the output as the new prior is a fixed point
    got2, ret2 = _run(spark, cur, [(k, v) for k, v in got.items()])
    assert got2 == got and ret2 == {}
