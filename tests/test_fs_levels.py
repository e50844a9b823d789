"""Multi-level (ordinal) Fellegi-Sunter comparisons — pipeline/fs.py
LevelParams / level_weight / estimate_mu_levels / wide_pair_levels.

The point of levels over booleans: a true near-dup and a dispersed-noise
impostor can tie at the SAME global hamming distance AND the same boolean
per-chunk agreement pattern (every chunk within chunk_dist), yet differ in
how many chunks are EXACTLY equal. The 3-level model (exact / near /
disagree) keeps that evidence; the boolean one throws it away — pinned by
test_levels_separate_what_booleans_cannot.
"""

from __future__ import annotations

import math
import random

import pytest

from hexspark.pipeline.fs import (
    FieldParams,
    LevelParams,
    estimate_mu_levels,
    fit_wide_levels,
    level_params_from_json,
    level_params_to_json,
    level_weight,
    match_weight,
    score_wide_fs_levels,
    wide_pair_agreements,
    wide_pair_levels,
)

P3 = LevelParams(m=(0.05, 0.15, 0.80), u=(0.70, 0.20, 0.10))


def _lw(lvl: int) -> float:
    return math.log2(P3.m[lvl] / P3.u[lvl])


@pytest.fixture(scope="module")
def lvl_pairs(spark):
    return spark.createDataFrame(
        [(1, 2, 2), (2, 1, 0), (3, None, 2), (4, 0, 0)],
        "pair_id long, f1 int, f2 int",
    )


def test_level_weight_values(spark, lvl_pairs):
    out = {
        r["pair_id"]: r["fs_weight"]
        for r in level_weight(lvl_pairs, {"f1": P3, "f2": P3}).collect()
    }
    assert out[1] == pytest.approx(_lw(2) + _lw(2))
    assert out[2] == pytest.approx(_lw(1) + _lw(0))
    assert out[3] == pytest.approx(0.0 + _lw(2))  # NULL field -> 0 evidence
    assert out[4] == pytest.approx(2 * _lw(0))


def test_level_weight_plan_is_projection(spark, lvl_pairs):
    plan = (
        level_weight(lvl_pairs, {"f1": P3})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_level_param_validation(spark, lvl_pairs):
    with pytest.raises(ValueError, match="one entry per level"):
        level_weight(lvl_pairs, {"f1": LevelParams(m=(0.5, 0.5), u=(0.3, 0.3, 0.4))})
    with pytest.raises(ValueError, match=">= 2 levels"):
        level_weight(lvl_pairs, {"f1": LevelParams(m=(1.0,), u=(1.0,))})
    with pytest.raises(ValueError, match="strictly"):
        level_weight(lvl_pairs, {"f1": LevelParams(m=(0.0, 1.0), u=(0.5, 0.5))})


def test_em_levels_recovers_planted_parameters(spark):
    """Pairs drawn from a known two-class 3-level model: EM must recover
    the per-level m/u vectors and the prevalence within loose tolerance."""
    rng = random.Random(0x315)
    true_m = {
        "a": (0.05, 0.15, 0.80),
        "b": (0.10, 0.30, 0.60),
        "c": (0.10, 0.20, 0.70),
    }
    true_u = {
        "a": (0.70, 0.20, 0.10),
        "b": (0.80, 0.15, 0.05),
        "c": (0.60, 0.30, 0.10),
    }
    true_p = 0.25

    def draw(probs):
        x, acc = rng.random(), 0.0
        for lvl, q in enumerate(probs):
            acc += q
            if x < acc:
                return lvl
        return len(probs) - 1

    rows = []
    for i in range(8000):
        is_match = rng.random() < true_p
        src_m, src_u = (true_m, true_u)
        rows.append(
            (
                i,
                draw(src_m["a"] if is_match else src_u["a"]),
                draw(src_m["b"] if is_match else src_u["b"]),
                draw(src_m["c"] if is_match else src_u["c"]),
            )
        )
    df = spark.createDataFrame(rows, "pair_id long, a int, b int, c int")
    params, p = estimate_mu_levels(df, {"a": 3, "b": 3, "c": 3})
    assert p == pytest.approx(true_p, abs=0.05)
    for f in ("a", "b", "c"):
        for lvl in range(3):
            assert params[f].m[lvl] == pytest.approx(true_m[f][lvl], abs=0.07), (f, lvl)
            assert params[f].u[lvl] == pytest.approx(true_u[f][lvl], abs=0.07), (f, lvl)


def test_em_levels_handles_nulls(spark):
    rng = random.Random(0xE11)
    rows = []
    for i in range(3000):
        is_match = rng.random() < 0.3
        a = 2 if (rng.random() < (0.85 if is_match else 0.1)) else 0
        b = (
            None
            if rng.random() < 0.3
            else (2 if (rng.random() < (0.85 if is_match else 0.1)) else 0)
        )
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "pair_id long, a int, b int")
    params, p = estimate_mu_levels(df, {"a": 3, "b": 3})
    assert 0.1 < p < 0.5
    assert params["b"].m[2] > 0.6 and params["b"].u[2] < 0.3


def test_em_levels_rejects_bad_input(spark):
    df = spark.createDataFrame([(1, 5)], "pair_id long, a int")
    with pytest.raises(ValueError, match="outside"):
        estimate_mu_levels(df, {"a": 3})
    with pytest.raises(ValueError, match="must not be empty"):
        estimate_mu_levels(df, {})
    with pytest.raises(ValueError, match=">= 2 levels"):
        estimate_mu_levels(df, {"a": 1})


# ---------------------------------------------------------------------------
# Wide-pair composition
# ---------------------------------------------------------------------------


def _wide3(spark):
    """Three wide pairs, same 8-chunk layout as test_fs._wide_pairs:

    * concentrated: 4 bits off, ALL in chunk 0 (true-near-dup shape)
    * dispersed: 4 bits off TOTAL?? no — 1 bit off in each of 4 chunks
      (same global dist 4, impostor shape)
    * far: 4 bits off in every chunk (dist 32)
    canon: concentrated full-prefix equal (lvl 2); dispersed half-prefix
    equal only (lvl 1); far disagrees (lvl 0).
    """
    base = [0x0F0F0F0F] * 8
    conc_b = [0x0F0F0F00] + [0x0F0F0F0F] * 7  # 4 bits in chunk 0
    disp_b = [0x0F0F0F0E] * 4 + [0x0F0F0F0F] * 4  # 1 bit in chunks 0-3
    far_b = [0x0F0F0F00] * 8
    prefix16 = "same prefix here"
    rows = [
        ("c1", "c2", prefix16 + "....", prefix16 + "....", *base, *conc_b),
        ("d1", "d2", prefix16 + "....", prefix16[:8] + "DIFFTAIL....", *base, *disp_b),
        ("f1", "f2", "one prefix here.....", "two prefix here.....", *base, *far_b),
    ]
    cols = (
        "conv_id_a string, conv_id_b string, canon_a string, canon_b string, "
        + ", ".join(f"c{i}_a long" for i in range(8))
        + ", "
        + ", ".join(f"c{i}_b long" for i in range(8))
    )
    return spark.createDataFrame(rows, cols)


def test_wide_pair_levels_fields(spark):
    df, levels = wide_pair_levels(_wide3(spark), chunk_dist=4, canon_prefix_len=16)
    assert levels == {**{f"lvl_c{i}": 3 for i in range(8)}, "lvl_canon": 3}
    rows = {r["conv_id_a"]: r for r in df.collect()}
    conc, disp, far = rows["c1"], rows["d1"], rows["f1"]
    assert conc["hamming_dist"] == disp["hamming_dist"] == 4
    assert [conc[f"lvl_c{i}"] for i in range(8)] == [1] + [2] * 7
    assert [disp[f"lvl_c{i}"] for i in range(8)] == [1] * 4 + [2] * 4
    assert conc["lvl_canon"] == 2
    assert disp["lvl_canon"] == 1  # first 8 chars agree, full 16 don't
    assert far["hamming_dist"] == 32
    assert all(far[f"lvl_c{i}"] == 1 for i in range(8))  # 4 bits == chunk_dist
    assert far["lvl_canon"] == 0
    # tighter radius drops the far pair's chunks to level 0
    df3, _ = wide_pair_levels(_wide3(spark), chunk_dist=3)
    far3 = {r["conv_id_a"]: r for r in df3.collect()}["f1"]
    assert all(far3[f"lvl_c{i}"] == 0 for i in range(8))


def test_levels_separate_what_booleans_cannot(spark):
    """concentrated vs dispersed at the SAME global distance 4 and the
    SAME boolean agreement pattern (every chunk within chunk_dist=4, canon
    16-prefix unequal made equal here) — the boolean weight ties; the
    3-level weight strictly prefers the concentrated (mostly-exact) pair."""
    base = [0x0F0F0F0F] * 8
    conc_b = [0x0F0F0F00] + [0x0F0F0F0F] * 7
    disp_b = [0x0F0F0F0E] * 4 + [0x0F0F0F0F] * 4
    pfx = "same prefix here...."
    rows = [("c1", "c2", pfx, pfx, *base, *conc_b), ("d1", "d2", pfx, pfx, *base, *disp_b)]
    cols = (
        "conv_id_a string, conv_id_b string, canon_a string, canon_b string, "
        + ", ".join(f"c{i}_a long" for i in range(8))
        + ", "
        + ", ".join(f"c{i}_b long" for i in range(8))
    )
    wide = spark.createDataFrame(rows, cols)

    bool_df, names = wide_pair_agreements(wide, chunk_dist=4)
    bp = {n: FieldParams(m=0.9, u=0.1) for n in names}
    bw = {r["conv_id_a"]: r["fs_weight"] for r in match_weight(bool_df, bp).collect()}
    assert bw["c1"] == pytest.approx(bw["d1"])  # boolean model is blind

    lvl_df, levels = wide_pair_levels(wide, chunk_dist=4)
    lp = {n: P3 for n in levels}
    lw = {r["conv_id_a"]: r["fs_weight"] for r in level_weight(lvl_df, lp).collect()}
    assert lw["c1"] > lw["d1"] + 3.0  # 3 more exact chunks at log2(8)-ish each


def test_score_wide_fs_levels_gate_schema_and_plan(spark):
    params = {f"lvl_c{i}": P3 for i in range(8)}
    params["lvl_canon"] = P3
    out = score_wide_fs_levels(_wide3(spark), params, threshold=0.0, chunk_dist=4)
    assert out.columns == ["conv_id_a", "conv_id_b", "hamming_dist", "fs_weight"]
    got = {r["conv_id_a"]: r["fs_weight"] for r in out.collect()}
    assert "f1" not in got  # 8 near + disagreeing canon < 0
    assert got["c1"] == pytest.approx(_lw(1) + 7 * _lw(2) + _lw(2))
    assert got["d1"] == pytest.approx(4 * _lw(1) + 4 * _lw(2) + _lw(1))
    plan = (
        score_wide_fs_levels(_wide3(spark), params, threshold=0.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonMapInArrow", "MapInPandas"):
        assert marker not in plan, marker
    with pytest.raises(ValueError, match="missing fields"):
        score_wide_fs_levels(_wide3(spark), {"lvl_c0": P3}, 0.0)


def test_fit_wide_levels_separates_planted_mixture(spark):
    """End-to-end unlabeled fit over a mixture of exact-ish dup pairs and
    random pairs: the fitted model must put the dup pairs' weight far
    above the random pairs' (fit + score on the same stream, as the
    runner would)."""
    rng = random.Random(0x51E)
    rows = []
    pfx = "shared canon text..."

    def chunks(mut_bits_per_chunk):
        out = []
        for _ in range(8):
            v = 0x5A5A5A5A
            for _ in range(mut_bits_per_chunk):
                v ^= 1 << rng.randrange(32)
            out.append(v)
        return out

    for i in range(300):  # matches: 0-1 bits per chunk, shared canon
        a = chunks(0)
        b = [v ^ (1 << rng.randrange(32)) if rng.random() < 0.3 else v for v in a]
        rows.append((f"m{i}a", f"m{i}b", pfx, pfx, *a, *b))
    for i in range(700):  # non-matches: random chunks, unrelated canon
        a = [rng.getrandbits(32) for _ in range(8)]
        b = [rng.getrandbits(32) for _ in range(8)]
        rows.append((f"r{i}a", f"r{i}b", f"left {i} text......", f"rite {i} text......", *a, *b))
    cols = (
        "conv_id_a string, conv_id_b string, canon_a string, canon_b string, "
        + ", ".join(f"c{i}_a long" for i in range(8))
        + ", "
        + ", ".join(f"c{i}_b long" for i in range(8))
    )
    wide = spark.createDataFrame(rows, cols)
    params, p = fit_wide_levels(wide, chunk_dist=4)
    assert p == pytest.approx(0.3, abs=0.1)
    scored = score_wide_fs_levels(wide, params, threshold=-1e9, chunk_dist=4)
    got = {r["conv_id_a"]: r["fs_weight"] for r in scored.collect()}
    match_w = [w for k, w in got.items() if k.startswith("m")]
    rand_w = [w for k, w in got.items() if k.startswith("r")]
    assert min(match_w) > max(rand_w)


# ---------------------------------------------------------------------------
# Runner mode
# ---------------------------------------------------------------------------


def test_runner_fs_levels_end_to_end(spark, tmp_path):
    """scoring_mode='fs_levels' through the Runner: same planted-impostor
    corpus as test_fs_pipeline (dispersed-difference pairs that fool the
    blend gate) — the level model must reject every impostor edge at full
    recall, record the level-format model in the manifest, and reuse it
    (unchanged) across an incremental fold."""
    import json
    import os

    from pyspark.sql import functions as F

    from hexspark import fixtures
    from hexspark.pipeline import evaluate
    from hexspark.pipeline.runner import PipelineConfig, Runner
    from tests.test_fs_pipeline import CFG, _corpus

    tr = _corpus(spark).persist()
    tr.count()
    labels = fixtures.labeled_pairs_df(spark, tr)
    wd = str(tmp_path / "fslvl")
    cfg = PipelineConfig(**CFG, scoring_mode="fs_levels")
    runner = Runner(spark, wd, cfg)
    res = runner.run(tr)
    assert res.tables["edges"].columns == [
        "conv_id_a", "conv_id_b", "hamming_dist", "fs_weight",
    ]
    m = evaluate.pairwise_f1(
        labels,
        res.tables["clusters"],
        candidate_pairs=res.tables["candidate_pairs"].select("conv_id_a", "conv_id_b"),
    )
    impostor_edges = (
        res.tables["edges"]
        .where(
            F.col("conv_id_a").rlike("^conv_[89]\\d{7}_")
            | F.col("conv_id_b").rlike("^conv_[89]\\d{7}_")
        )
        .count()
    )
    assert m["recall"] == 1.0
    # the blend gate admits >= 3 of the 6 planted impostors on this corpus
    # (pinned by test_fs_pipeline.test_blend_is_fooled_by_planted_impostors);
    # the level model must reject all but at most one (the 40/48-shared
    # pair sits closest to the duplicate population) at F1 >= 0.995
    assert impostor_edges <= 1 and m["fp"] <= 1.0
    assert m["f1"] >= 0.995
    with open(os.path.join(wd, "run_manifest.json")) as f:
        model_before = json.load(f)["fs_model"]
    assert set(model_before) == {"p", "levels", "threshold"}
    assert set(model_before["levels"]) == {f"lvl_c{i}" for i in range(8)} | {"lvl_canon"}
    for mm, uu in model_before["levels"].values():
        assert len(mm) == len(uu) == 3
        assert all(0.0 < x < 1.0 for x in mm + uu)

    # incremental fold reuses the fitted level model (no refit)
    donor = tr.select("conv_id").distinct().orderBy("conv_id").limit(1).collect()[0][0]
    base = donor.rsplit("_d", 1)[0]
    newtr = tr.where(F.col("conv_id") == donor).withColumn(
        "conv_id", F.lit(f"{base}_d9")
    )
    res2 = Runner(spark, wd, cfg).run_incremental(newtr)
    with open(os.path.join(wd, "run_manifest.json")) as f:
        model_after = json.load(f)["fs_model"]
    assert model_after == model_before
    cl = {r["conv_id"]: r["cluster_id"] for r in res2.tables["clusters"].collect()}
    assert cl[f"{base}_d9"] == cl[donor]
    tr.unpersist()


def test_runner_rejects_unknown_scoring_mode(spark, tmp_path):
    from hexspark.pipeline.runner import PipelineConfig, Runner

    with pytest.raises(ValueError, match="scoring_mode must be"):
        Runner(spark, str(tmp_path / "x"), PipelineConfig(scoring_mode="nope"))


def test_level_params_json_roundtrip():
    params = {"lvl_c0": P3, "lvl_canon": LevelParams(m=(0.2, 0.8), u=(0.9, 0.1))}
    j = level_params_to_json(params, 0.3)
    back, p = level_params_from_json(j)
    assert p == 0.3 and back == params
