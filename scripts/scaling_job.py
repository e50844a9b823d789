"""Scaling-evidence job: the identical ER workload on identical input,
launched via `spark-submit --py-files hexspark.zip` at two parallelism
levels (see scripts/scaling_run.py). Master/cores come from spark-submit —
this module does NOT set a master, so the submitted configuration governs.

Emits one JSON line with per-stage wall times and throughputs.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True, help="cores for partition sizing")
    ap.add_argument("--n-base", type=int, default=2000)
    ap.add_argument("--pairs-target", type=int, default=8_000_000)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName(f"hexspark-scaling-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hexspark import fixtures
    from hexspark.pipeline import assemble, blocking, clustering, scoring
    from hexspark.pipeline import simhash as simhash_mod
    from hexspark.pipeline.scoring import _JW_SCHEMA, _jw_batches, hamming_jvm, sig_chunks

    t: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        t[name] = round(time.monotonic() - t0, 3)
        return out

    # identical input at every parallelism level: same seed, same n_base,
    # same generation partitioning (fixed at 64, not cpu-dependent)
    tr = fixtures.transcripts_df(
        spark, n_base=args.n_base, seed=42, mutation_rate=0.01, partitions=64
    ).persist()
    n_turns = timed("generate", tr.count)

    convs = assemble.assemble_conversations(tr)
    sigs = simhash_mod.signatures(convs).persist()
    n_convs = timed("fingerprint", sigs.count)

    pairs, _ = blocking.candidate_pairs(sigs)
    pairs = pairs.persist()
    n_pairs = timed("blocking", pairs.count)

    edges = scoring.score_and_match(pairs, sigs, max_dist=40).persist()
    n_edges = timed("scoring", edges.count)

    def run_cc():
        cc, rounds = clustering.connected_components(edges)
        clusters = clustering.with_singletons(cc, sigs.select("conv_id"))
        return clusters.count(), rounds

    (n_clusters, rounds) = timed("clustering", run_cc)

    # bulk pair-scoring throughput at a fixed pair count (input-identical
    # across parallelism levels; only partitioning differs)
    # bulk pair workload: every signature against a broadcast probe set —
    # n_convs x n_probe pairs, embarrassingly parallel (the scan side is
    # repartitioned across all cores; no join-key skew, nothing
    # materialized — generate→gate→score runs as one codegen pipeline)
    n_probe = max(args.pairs_target // n_convs, 1)
    probe_mod = max(n_convs // n_probe, 1)  # deterministic probe subset
    a = sigs.select(
        F.col("conv_id").alias("conv_id_a"), F.col("canon").alias("canon_a"),
        *sig_chunks("a"),
    ).repartition(args.cpus * 4)
    b = (
        sigs.where(F.pmod(F.xxhash64("conv_id"), F.lit(probe_mod)) == 0)
        .select(
            F.col("conv_id").alias("conv_id_b"), F.col("canon").alias("canon_b"),
            *sig_chunks("b"),
        )
    )
    bulk = a.crossJoin(F.broadcast(b)).where(F.col("conv_id_a") != F.col("conv_id_b"))
    n_bulk = bulk.count()

    def bulk_once() -> int:
        return (
            bulk.withColumn("hamming_dist", hamming_jvm())
            .where(F.col("hamming_dist") <= 60)
            .select("conv_id_a", "conv_id_b", "hamming_dist", "canon_a", "canon_b")
            .mapInArrow(_jw_batches(0.75), _JW_SCHEMA)
            .where(F.col("score") >= 0.5)
            .count()
        )

    # best-of-3 warm runs: the first pass pays python-worker start + JIT;
    # the steady-state number is what a long-running job sees
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        n_match = bulk_once()
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    t["bulk_scoring"] = round(best, 3)

    pipeline_sec = sum(t[k] for k in ("fingerprint", "blocking", "scoring", "clustering"))
    out = {
        "cpus": args.cpus,
        "timings": t,
        "n_turns": n_turns,
        "n_convs": n_convs,
        "n_candidate_pairs": n_pairs,
        "n_edges": n_edges,
        "n_clusters": n_clusters,
        "cc_rounds": rounds,
        "bulk_pairs": n_bulk,
        "bulk_pairs_per_sec": round(n_bulk / t["bulk_scoring"], 1),
        "pipeline_sec": round(pipeline_sec, 3),
        "pipeline_convs_per_sec": round(n_convs / pipeline_sec, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
