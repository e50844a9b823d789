"""Robust-mode cost: what does triangle corroboration add to a batch run?

Runs the IDENTICAL pipeline twice on the same synthetic corpus — default
(high-recall transitive closure) vs robust=True (cluster on corroborated
edges only + bridge-edge review queue) — and reports per-stage walls from
the run manifests plus the bridge-queue volume. The question this answers
for a 100-TB operator: the extra stages are ONE degree-oriented triangle
enumeration over the match graph (3 node-keyed shuffles, hub-bounded) and
one pair-keyed anti-join, both edge-proportional — so the overhead should
be a modest fraction of the pipeline wall, not a multiple of it.

    python scripts/robust_bench.py          # writes build/robust_bench.json

An untimed warmup run precedes each timed mode (steady-state JIT/codegen,
same methodology as bench.py).
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
    n_base = int(os.environ.get("ROBUST_BENCH_N_BASE", "4000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from hexspark.session import get_spark

    spark = get_spark(
        "robust-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hexspark import fixtures
    from hexspark.pipeline.runner import PipelineConfig, Runner

    tr = fixtures.transcripts_df(spark, n_base=n_base, seed=42, mutation_rate=0.01)
    tr = tr.persist()
    n_turns = tr.count()

    out: dict = {"n_base": n_base, "n_turns": n_turns, "cpus": cpus, "modes": {}}
    for robust in (False, True):
        # untimed warmup (fresh workdir), then one timed fresh-workdir run
        for timed in (False, True):
            wd = tempfile.mkdtemp(prefix=f"robustbench_{robust}_")
            cfg = PipelineConfig(max_dist=40, robust=robust)
            t0 = time.monotonic()
            res = Runner(spark, wd, cfg).run(tr)
            wall = time.monotonic() - t0
            if timed:
                with open(os.path.join(wd, "run_manifest.json")) as f:
                    manifest = json.load(f)
                mode = {
                    "wall_sec": round(wall, 3),
                    "stages": {
                        s: {"rows": v["rows"], "wall_ms": v["wall_ms"]}
                        for s, v in manifest["completed"].items()
                    },
                    "n_clusters": res.tables["clusters"]
                    .select("cluster_id")
                    .distinct()
                    .count(),
                }
                out["modes"]["robust" if robust else "default"] = mode
            shutil.rmtree(wd, ignore_errors=True)

    d, r = out["modes"]["default"], out["modes"]["robust"]
    out["robust_overhead_x"] = round(r["wall_sec"] / d["wall_sec"], 3)
    out["graph_stage_share"] = round(
        (
            r["stages"].get("triangles", {}).get("wall_ms", 0)
            + r["stages"].get("bridge_edges", {}).get("wall_ms", 0)
        )
        / (r["wall_sec"] * 1000.0),
        3,
    )
    out["bridge_edges"] = r["stages"].get("bridge_edges", {}).get("rows")
    out["match_edges"] = r["stages"].get("edges", {}).get("rows")
    # precision mode splits lone-edge merges, so it can only have >= as
    # many clusters as the default closure
    out["clusters_default"] = d["n_clusters"]
    out["clusters_robust"] = r["n_clusters"]

    os.makedirs(os.path.join(REPO, "build"), exist_ok=True)
    with open(os.path.join(REPO, "build", "robust_bench.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
