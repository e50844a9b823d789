"""Incremental-update cost evidence: processing a small new batch through
Runner.run_incremental vs re-running the full batch pipeline on the grown
corpus.

The incremental path's claim (hexspark/pipeline/incremental.py) is that
per-batch cost scales with the batch, not the corpus: only the batch is
fingerprinted, candidate generation never joins the old-old quadrant, and
connected components re-runs over only the affected clusters. This script
measures that claim at a fixed corpus/batch ratio and prints one JSON line:

    python scripts/incremental_bench.py [--n-base 12000] [--batch-pct 5]

Outputs build/incremental_bench.json with base_run_sec (the prior batch
run), full_rerun_sec (batch pipeline over the grown corpus — what a daily
full re-run would pay), incremental_sec (what the incremental path pays),
and the resulting speedup. Also verifies the two paths' cluster tables are
identical before reporting any number (a fast wrong answer is not a
result).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hexspark import fixtures  # noqa: E402
from hexspark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-base", type=int, default=12000)
    ap.add_argument("--batch-pct", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--workroot", default="/tmp/hexspark-incbench")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = args.out or os.path.join(repo, "build", "incremental_bench.json")
    shutil.rmtree(args.workroot, ignore_errors=True)

    spark = get_spark(
        "incremental-bench", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hexspark.pipeline.runner import PipelineConfig, Runner

    tr = fixtures.transcripts_df(spark, n_base=args.n_base, seed=42,
                                 mutation_rate=0.01)
    # deterministic batch split by conversation
    mod = max(2, round(100 / args.batch_pct))
    new_flag = F.pmod(F.xxhash64("conv_id"), F.lit(mod)) == 0
    base_path = os.path.join(args.workroot, "transcripts_base")
    new_path = os.path.join(args.workroot, "transcripts_new")
    all_path = os.path.join(args.workroot, "transcripts_all")
    tr.where(~new_flag).write.parquet(base_path)
    tr.where(new_flag).write.parquet(new_path)
    tr.write.parquet(all_path)
    tr_base = spark.read.parquet(base_path)
    tr_new = spark.read.parquet(new_path)
    tr_all = spark.read.parquet(all_path)
    n_all = tr_all.select("conv_id").distinct().count()
    n_new = tr_new.select("conv_id").distinct().count()

    cfg = PipelineConfig(max_dist=40)

    # warmup: JIT, codegen caches, python workers (steady-state basis, same
    # rationale as scripts/scaling_job.py)
    warm = Runner(spark, os.path.join(args.workroot, "warm"), cfg)
    warm.run(tr_base.limit(50_000))

    base_runner = Runner(spark, os.path.join(args.workroot, "base"), cfg)
    t0 = time.monotonic()
    base_runner.run(tr_base)
    base_run_sec = time.monotonic() - t0

    t0 = time.monotonic()
    inc_result = base_runner.run_incremental(tr_new)
    incremental_sec = time.monotonic() - t0

    full_runner = Runner(spark, os.path.join(args.workroot, "full"), cfg)
    t0 = time.monotonic()
    full_result = full_runner.run(tr_all)
    full_rerun_sec = time.monotonic() - t0

    # correctness gate before any throughput claim
    inc_clusters = inc_result.tables["clusters"]
    full_clusters = full_result.tables["clusters"]
    diff = inc_clusters.exceptAll(full_clusters).count() + full_clusters.exceptAll(
        inc_clusters
    ).count()
    if diff:
        raise SystemExit(f"incremental != full rerun: {diff} differing rows")

    out = {
        "n_convs_total": n_all,
        "n_convs_batch": n_new,
        "batch_fraction": round(n_new / n_all, 4),
        "cpus": args.cpus,
        "base_run_sec": round(base_run_sec, 3),
        "full_rerun_sec": round(full_rerun_sec, 3),
        "incremental_sec": round(incremental_sec, 3),
        "speedup_vs_full_rerun": round(full_rerun_sec / incremental_sec, 2),
        "clusters_identical": True,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(args.workroot, ignore_errors=True)


if __name__ == "__main__":
    main()
