"""Adversarial containment benchmark: prove the prefix-index blocker
(pipeline/align.prefix_block_pairs) costs ~O(total turns), not O(n²),
on the worst-case transcript corpus — EVERY conversation opening with
the same system prompt.

Corpus (deterministic, pure codegen generation): n base conversations of
8 turns each (turn 0 = one universal system prompt, turns 1.. unique by
conv index), plus for every 4th base conversation a 4-turn PREFIX copy
and a 12-turn RESUMED extension — so true containment pairs = 3 per
planted family (prefix⊂base, prefix⊂resumed, base⊂resumed) and the
opening blocker's counterfactual is C(total,2) (every conversation shares
turn 0). n doubles across runs; if the prefix index is linear, candidate
counts and walls grow ~linearly while the opener counterfactual grows 4x.

Also asserts correctness at each size: candidates == exactly the planted
containment pairs (no boilerplate pollution), and contained_map drops
exactly the prefix + base copies, mapping both to the resumed extension.

Run: python scripts/containment_bench.py [--out build/containment_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

SYS_PROMPT = "you are a helpful assistant respond concisely"


def synth_transcripts(spark, n_base: int, parts: int = 32):
    """One DataFrame of turn rows. Base conv b<i>: 8 turns; every 4th i
    also gets p<i> (first 4 turns) and r<i> (base + 4 more turns)."""
    base = spark.range(0, n_base, 1, parts)

    def turns(conv_prefix, n_turns, extended=False):
        # turn 0 is the universal system prompt; the rest are unique per
        # conv (xxhash64 of (id, turn)) so non-family convs never align
        # past turn 0
        seq = F.sequence(F.lit(0), F.lit(n_turns - 1))
        return base.select(
            F.concat(F.lit(conv_prefix), F.col("id").cast("string")).alias("conv_id"),
            F.col("id").alias("_base"),
            F.explode(seq).alias("turn_idx"),
        ).select(
            "conv_id",
            "turn_idx",
            F.when(F.col("turn_idx") == 0, F.lit("system"))
            .otherwise(F.lit("user"))
            .alias("role"),
            F.when(F.col("turn_idx") == 0, F.lit(SYS_PROMPT))
            .otherwise(
                F.concat(
                    F.lit("turn "),
                    F.hex(F.xxhash64("_base", "turn_idx")),
                )
            )
            .alias("text"),
        )

    b = turns("b", 8)
    planted = base.where(F.col("id") % 4 == 0)
    p = turns("p", 4).join(
        planted.select(F.concat(F.lit("p"), F.col("id").cast("string")).alias("conv_id")),
        "conv_id",
        "left_semi",
    )
    r = turns("r", 12).join(
        planted.select(F.concat(F.lit("r"), F.col("id").cast("string")).alias("conv_id")),
        "conv_id",
        "left_semi",
    )
    return b.unionByName(p).unionByName(r)


def run_once(spark, n_base: int) -> dict:
    from hexspark.pipeline import align

    tr = synth_transcripts(spark, n_base).persist()
    n_rows = tr.count()  # materialize outside the timer
    n_convs = n_base + 2 * ((n_base + 3) // 4)
    t0 = time.monotonic()
    sigs = align.turn_signatures(tr, content_cols=("role", "text")).persist()
    sigs.count()
    t_sigs = time.monotonic() - t0
    t0 = time.monotonic()
    cands = align.prefix_block_pairs(sigs).persist()
    n_cands = cands.count()
    t_block = time.monotonic() - t0
    t0 = time.monotonic()
    cm = align.contained_map(sigs).persist()
    n_dropped = cm.count()
    t_map = time.monotonic() - t0

    planted = (n_base + 3) // 4
    expected_cands = 3 * planted  # p⊂b, p⊂r, b⊂r per family
    expected_dropped = 2 * planted  # p and b drop into r
    bad_rep = cm.where(~F.col("rep_id").startswith("r")).count()
    ok = n_cands == expected_cands and n_dropped == expected_dropped and bad_rep == 0
    tr.unpersist(), sigs.unpersist(), cands.unpersist(), cm.unpersist()
    return {
        "n_base": n_base,
        "n_convs": n_convs,
        "n_turn_rows": n_rows,
        "candidates": n_cands,
        "expected_candidates": expected_cands,
        "dropped": n_dropped,
        "expected_dropped": expected_dropped,
        "opener_counterfactual_pairs": n_convs * (n_convs - 1) // 2,
        "correct": ok,
        "signatures_wall_sec": round(t_sigs, 3),
        "blocking_wall_sec": round(t_block, 3),
        "contained_map_wall_sec": round(t_map, 3),
        "total_wall_sec": round(t_sigs + t_block + t_map, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="build/containment_bench.json")
    ap.add_argument("--sizes", default="20000,40000,80000")
    args = ap.parse_args()

    from hexspark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("containment-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    sizes = [int(s) for s in args.sizes.split(",")]
    run_once(spark, min(sizes))  # warmup: JIT/codegen/session state off the clock
    runs = [run_once(spark, s) for s in sizes]
    growth = []
    for a, b in zip(runs, runs[1:]):
        growth.append(
            {
                "convs_ratio": round(b["n_convs"] / a["n_convs"], 2),
                "candidates_ratio": round(b["candidates"] / max(a["candidates"], 1), 2),
                "wall_ratio": round(b["total_wall_sec"] / a["total_wall_sec"], 2),
                "counterfactual_ratio": round(
                    b["opener_counterfactual_pairs"] / a["opener_counterfactual_pairs"], 2
                ),
            }
        )
    out = {"runs": runs, "growth": growth, "cpus": cpus}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    spark.stop()
    if not all(r["correct"] for r in runs):
        sys.exit(1)


if __name__ == "__main__":
    main()
