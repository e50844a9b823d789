"""Meta-blocking cost/benefit: what does WNP candidate pruning buy?

Runs the IDENTICAL pipeline on the same synthetic corpus in three modes —
meta_prune off / "wep" / "wnp" — and reports per-stage walls from the run
manifests, the candidate-pair reduction, and pairwise F1 vs the planted
labels for each mode. The question this answers for a 100-TB operator:
the prune costs one slim node-keyed window pass + one pair-keyed
semi-join (the CBS weight itself is free codegen on the wide pairs), and
in exchange the quadratic SCORING phase sees a strictly smaller input —
so the prune should pay for itself as scoring cost grows, while F1 must
not move (the planted duplicates ride high-evidence edges).

    python scripts/meta_bench.py          # writes build/meta_bench.json

An untimed warmup run precedes each timed mode (steady-state JIT/codegen,
same methodology as bench.py / robust_bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_base = int(os.environ.get("META_BENCH_N_BASE", "4000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from hexspark.session import get_spark

    spark = get_spark(
        "meta-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hexspark import fixtures
    from hexspark.pipeline import evaluate
    from hexspark.pipeline.runner import PipelineConfig, Runner

    tr = fixtures.transcripts_df(spark, n_base=n_base, seed=42, mutation_rate=0.01)
    tr = tr.persist()
    n_turns = tr.count()
    labels = fixtures.labeled_pairs_df(spark, tr).persist()
    labels.count()

    out: dict = {"n_base": n_base, "n_turns": n_turns, "cpus": cpus, "modes": {}}
    for scheme in ("off", "wep", "wnp", "cnp"):
        for timed in (False, True):
            wd = tempfile.mkdtemp(prefix=f"metabench_{scheme}_")
            cfg = PipelineConfig(max_dist=40, meta_prune=scheme)
            t0 = time.monotonic()
            res = Runner(spark, wd, cfg).run(tr)
            wall = time.monotonic() - t0
            if timed:
                with open(os.path.join(wd, "run_manifest.json")) as f:
                    manifest = json.load(f)
                scored = (
                    "pruned_pairs" if scheme != "off" else "candidate_pairs"
                )
                m = evaluate.pairwise_f1(
                    labels,
                    res.tables["clusters"],
                    candidate_pairs=res.tables[scored].select(
                        "conv_id_a", "conv_id_b"
                    ),
                )
                out["modes"][scheme] = {
                    "wall_sec": round(wall, 3),
                    "stages": {
                        s: {"rows": v["rows"], "wall_ms": v["wall_ms"]}
                        for s, v in manifest["completed"].items()
                    },
                    "pairs_scored": manifest["completed"][scored]["rows"],
                    "f1": round(m["f1"], 6),
                    "precision": round(m["precision"], 6),
                    "recall": round(m["recall"], 6),
                }
            shutil.rmtree(wd, ignore_errors=True)

    base = out["modes"]["off"]
    for scheme in ("wep", "wnp", "cnp"):
        mode = out["modes"][scheme]
        out[f"{scheme}_pair_reduction"] = round(
            1 - mode["pairs_scored"] / base["pairs_scored"], 3
        )
        out[f"{scheme}_overhead_x"] = round(
            mode["wall_sec"] / base["wall_sec"], 3
        )
        out[f"{scheme}_f1_delta"] = round(mode["f1"] - base["f1"], 6)

    os.makedirs(os.path.join(REPO, "build"), exist_ok=True)
    with open(os.path.join(REPO, "build", "meta_bench.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
