"""Active-learning pair selection (pipeline/active.py).

Selector semantics are pinned against hand-computed expectations on a
deterministic scored-pair fixture, plus a plan-shape test proving the
global top-k compiles to TakeOrderedAndProject (per-partition heaps, no
global sort exchange) — the property that makes a 10^2-size labeling
budget affordable over a 10^12-row pair stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline import active


@pytest.fixture(scope="module")
def scored(spark):
    # (id_a, id_b, block, hamming_dist, jw, score) — scores straddle 0.80
    rows = [
        (1, 2, "en", 4, 0.99, 0.97),
        (1, 3, "en", 18, 0.91, 0.83),   # margin .03
        (2, 3, "en", 22, 0.88, 0.79),   # margin .01  <- closest
        (4, 5, "en", 30, 0.70, 0.55),
        (6, 7, "de", 12, 0.93, 0.86),   # margin .06
        (6, 8, "de", 25, 0.82, 0.76),   # margin .04
        (7, 8, "de", 40, 0.50, 0.30),
        (9, 10, "fr", 20, 0.85, 0.80),  # margin .00 <- exactly on it
    ]
    df = spark.createDataFrame(
        rows, "conv_id_a long, conv_id_b long, lang string, "
        "hamming_dist int, jw double, score double"
    )
    df.persist().count()
    yield df
    df.unpersist()


def test_uncertainty_topk_exact(scored):
    got = active.uncertainty_pairs(scored, threshold=0.80, k=3).collect()
    picked = [(r.conv_id_a, r.conv_id_b) for r in got]
    # margins: (9,10)=0.00 < (2,3)=0.01 < (1,3)=0.03 < (6,8)=0.04 ...
    assert picked == [(9, 10), (2, 3), (1, 3)]
    assert got[0].margin == pytest.approx(0.0)
    assert got[1].margin == pytest.approx(0.01)


def test_uncertainty_tiebreak_deterministic(spark):
    # Two pairs at the identical margin: ids break the tie ascending.
    df = spark.createDataFrame(
        [(5, 9, 0.70), (1, 2, 0.90), (3, 4, 0.90)],
        "conv_id_a long, conv_id_b long, score double",
    )
    got = active.uncertainty_pairs(df, threshold=0.80, k=2).collect()
    assert [(r.conv_id_a, r.conv_id_b) for r in got] == [(1, 2), (3, 4)]


def test_uncertainty_k_larger_than_input(scored):
    assert active.uncertainty_pairs(scored, 0.80, k=100).count() == 8


def test_uncertainty_plan_is_take_ordered(scored):
    plan = (
        active.uncertainty_pairs(scored, 0.80, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    # No global sort exchange: rangepartitioning would mean a full sort.
    assert "rangepartitioning" not in plan.lower()


def test_per_block_budget(scored):
    got = active.uncertainty_per_block(
        scored, threshold=0.80, k_per_block=2, block_col="lang"
    ).collect()
    by_lang: dict[str, list] = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    # every stratum gets its own budget — fr has 1 pair, en/de get 2 each
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 2, "de": 2, "fr": 1}
    en = sorted(by_lang["en"], key=lambda r: r.sel_rank)
    assert [(r.conv_id_a, r.conv_id_b) for r in en] == [(2, 3), (1, 3)]
    assert all(1 <= r.sel_rank <= 2 for r in got)


def test_disagreement_selects_split_votes(scored):
    votes = [
        F.col("hamming_dist") <= 20,
        F.col("jw") >= 0.90,
        F.col("score") >= 0.80,
    ]
    got = active.disagreement_pairs(scored, votes).collect()
    picked = {(r.conv_id_a, r.conv_id_b) for r in got}
    # unanimous-yes (1,2) and unanimous-no (4,5),(7,8) are excluded
    assert (1, 2) not in picked
    assert (4, 5) not in picked and (7, 8) not in picked
    # (1,3): ham no(18<=20 yes actually) — compute: (1,3) ham 18<=20 yes, jw .91 yes, score .83 yes => unanimous
    assert (1, 3) not in picked
    # (2,3): ham 22 no, jw .88 no, score .79 no => unanimous no
    assert (2, 3) not in picked
    # (6,8): ham 25 no, jw .82 no, score .76 no => out; (6,7): 12 yes,.93 yes,.86 yes => out
    # (9,10): ham 20 yes, jw .85 no, score .80 yes => split, n_yes=2
    assert picked == {(9, 10)}
    assert got[0].n_yes == 2


def test_disagreement_validations(scored):
    with pytest.raises(ValueError):
        active.disagreement_pairs(scored, [F.col("score") >= 0.5])
    with pytest.raises(ValueError):
        active.disagreement_pairs(
            scored, [F.col("score") >= 0.5, F.col("jw") >= 0.5], min_yes=2
        )


def test_disagreement_no_shuffle(scored):
    votes = [F.col("hamming_dist") <= 20, F.col("score") >= 0.80]
    plan = (
        active.disagreement_pairs(scored, votes)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
