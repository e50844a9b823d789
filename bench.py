"""Benchmark harness — one JSON line to stdout.

Runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

  er_pipeline      : full ER pipeline (assemble → SimHash → LSH block →
                     score → connected components) over the synthetic
                     transcript table scaled to the SF
  scoring_kernel   : hamming+JW scoring throughput over ~2M signature pairs
                     (the moral equivalent of the reference's pairs/sec
                     number — BASELINE.md: ~10.3M pairs/s single-core for
                     the bare C hamming call at 64 hex chars)
  hamming_pairs / match_edges / minhash_pairs / ann_topk / exact_dedup:
                     driver-contract queries over the testdata tables

Output: {"metric": "headline_suite_sec", "value": <total sec>, "unit":
"sec", "queries": {...per-query sec...}, "sf": <sf>, plus throughput keys}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cpu_snap() -> list[int]:
    # aggregate jiffies: user nice system idle iowait irq softirq steal
    return [int(x) for x in open("/proc/stat").readline().split()[1:9]]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from hexspark import fixtures
    from hexspark.pipeline import assemble, blocking, clustering, scoring, simhash
    from hexspark.session import get_spark

    spark = get_spark(
        app_name="hexspark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # fixed pre-touched heap: heap growth/uncommit re-faulting costs
            # multi-core kernel time on this firecracker VM (see
            # BENCH/BASELINE.md methodology notes)
            "spark.driver.extraJavaOptions": "-Xms14g -XX:+AlwaysPreTouch",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    cpu0 = _cpu_snap()

    def timed(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    def best_of(fn, n: int = 3) -> float:
        """One untimed warmup + best of n timed fresh-plan passes. The r2
        bench timed each driver query once, cold, inside one long-lived
        session — JIT/heap state drift between rounds produced 2-4x
        phantom swings (ann_topk, match_edges) on unchanged query text.
        Best-of-n on a warm session is the same steady-state methodology
        the scaling harness uses; each pass re-invokes fn so the plan is
        rebuilt fresh (no result/plan caching across passes)."""
        fn()
        best = float("inf")
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    # --- ER pipeline over synthetic transcripts scaled to SF ---------------
    n_base = max(int(20000 * sf), 200)
    # materialize the input before the pipeline timer: generation is
    # harness cost, not engine cost (the scaling job does the same)
    tr = fixtures.transcripts_df(spark, n_base=n_base, seed=42, mutation_rate=0.01).persist()
    tr.count()

    def run_pipeline():
        convs = assemble.assemble_conversations(tr)
        sigs = simhash.signatures(convs).persist()
        n_sigs = sigs.count()
        pairs, _ = blocking.candidate_pairs_wide(sigs)
        pairs = pairs.persist()
        n_pairs = pairs.count()
        edges = scoring.score_wide(pairs, max_dist=40).persist()
        n_edges = edges.count()
        cc, rounds = clustering.connected_components(edges)
        clusters = clustering.with_singletons(cc, sigs.select("conv_id"))
        n_clusters = clusters.count()
        pairs.unpersist()
        edges.unpersist()
        return sigs, n_sigs, n_pairs, n_edges, n_clusters, rounds

    # warmup pass (untimed): a production ER job is long-running — steady
    # state with warm JIT/codegen and live Python workers is the honest
    # measurement; a cold pass times C2 compilation + per-core worker spawn
    # + numpy import, costs that grow with core count and at this input
    # size exceed the engine work severalfold (see BENCH/BASELINE.md).
    warm = run_pipeline()
    for df in (warm[0],):
        df.unpersist()
    sigs, n_sigs, n_pairs, n_edges, n_clusters, rounds = timed("er_pipeline", run_pipeline)

    # fused production plan (extra metric, NOT in the headline total so
    # `value` stays comparable round-over-round): one action chain, no
    # per-stage persists — pairs stream from the band join through the
    # codegen gate into the Arrow scorer and the CC checkpoint
    def run_fused():
        from hexspark.pipeline.fused import fused_clusters

        clusters, fsigs, _ = fused_clusters(tr, max_dist=40)
        n = clusters.count()
        fsigs.unpersist()
        return n

    t0 = time.monotonic()
    run_fused()
    extras["er_pipeline_fused_sec"] = round(time.monotonic() - t0, 3)
    extras["er_fused_convs_per_sec"] = round(
        n_sigs / extras["er_pipeline_fused_sec"], 1
    )
    extras["er_n_convs"] = n_sigs
    extras["er_n_candidate_pairs"] = n_pairs
    extras["er_n_edges"] = n_edges
    extras["er_n_clusters"] = n_clusters
    extras["er_cc_rounds"] = rounds
    extras["er_convs_per_sec"] = round(n_sigs / timings["er_pipeline"], 1)

    # --- bulk scoring throughput (~2M pairs) --------------------------------
    # bucket self-join yields ~n^2/(2*n_buckets) pairs; the explicit
    # repartition spreads the scored pairs across all cores regardless of
    # how few join keys there are.
    pairs_target = 8_000_000
    n_buckets = max(round(n_sigs * n_sigs / 2 / pairs_target), 1)
    from hexspark.pipeline.scoring import _JW_SCHEMA, _jw_batches, hamming_jvm, sig_chunks

    a = sigs.select(
        F.col("conv_id").alias("conv_id_a"), F.col("canon").alias("canon_a"),
        *sig_chunks("a"),
        F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).alias("bk"),
    )
    b = sigs.select(
        F.col("conv_id").alias("conv_id_b"), F.col("canon").alias("canon_b"),
        *sig_chunks("b"),
        F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).alias("bk"),
    )
    bulk = (
        a.join(b, "bk")
        .where(F.col("conv_id_a") < F.col("conv_id_b"))
        .drop("bk")
        .repartition(cpus * 2)
        .persist()
    )
    total_bulk = bulk.count()  # materialize pairs so kernels time only scoring
    n_h = timed(
        "scoring_hamming",
        lambda: bulk.withColumn("hamming_dist", hamming_jvm())
        .where(F.col("hamming_dist") <= 40)
        .count(),
    )
    n_hjw = timed(
        "scoring_hybrid",
        lambda: bulk.withColumn("hamming_dist", hamming_jvm())
        .where(F.col("hamming_dist") <= 60)
        .select("conv_id_a", "conv_id_b", "hamming_dist", "canon_a", "canon_b")
        .mapInArrow(_jw_batches(0.75), _JW_SCHEMA)
        .where(F.col("score") >= 0.5)
        .count(),
    )
    # Fellegi-Sunter scorer over the same pair stream (extras-only so the
    # headline total stays comparable round-over-round): the FS path is one
    # codegen projection + filter — no Arrow/Python boundary at all — so it
    # should beat the hybrid blend wall on identical input. Fixed params
    # (not EM-fitted) because this times the SCORER, not the fit.
    from hexspark.pipeline import fs as fsmod

    fs_params = {f"agree_c{i}": fsmod.FieldParams(0.9, 0.05) for i in range(8)}
    fs_params["agree_canon"] = fsmod.FieldParams(0.9, 0.2)
    t0 = time.monotonic()
    fsmod.score_wide_fs(bulk, fs_params, threshold=2.0).count()
    fs_wall = time.monotonic() - t0
    extras["scoring_fs_sec"] = round(fs_wall, 3)
    extras["fs_pairs_scored_per_sec"] = round(total_bulk / fs_wall, 1)
    bulk.unpersist()
    extras["bulk_pairs_scored"] = int(total_bulk)
    extras["hamming_pairs_per_sec"] = round(total_bulk / timings["scoring_hamming"], 1)
    extras["pairs_scored_per_sec"] = round(total_bulk / timings["scoring_hybrid"], 1)

    # --- driver-contract queries over testdata ------------------------------
    # warmup + best-of-3 per query (see best_of): regression signal, not
    # session-state noise
    qs = entrymod.queries()
    for name in ("hamming_pairs", "match_edges", "minhash_pairs", "ann_topk", "exact_dedup"):
        timings[name] = best_of(lambda n=name: qs[n](spark, sf_dir).count())

    # --- corpus hygiene ops over the documents table (extras-only: the
    # headline total stays comparable round-over-round) --------------------
    try:
        from hexspark.ops.lm import lm_score, train_bigram_lm
        from hexspark.ops.pii import scrub_documents
        from hexspark.ops.quality import repetition_filter

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).persist()
        n_docs = docs.count()
        hyg = {
            "pii_scrub": best_of(
                lambda: scrub_documents(docs).agg(F.sum("n_pii_total")).collect()
            ),
            "repetition_filter": best_of(
                lambda: repetition_filter(docs)
                .agg(F.sum(F.col("keep").cast("long")))
                .collect()
            ),
        }
        lm = train_bigram_lm(docs)
        lm.unigrams.persist().count()
        lm.bigrams.persist().count()
        hyg["lm_score"] = best_of(
            lambda: lm_score(docs, lm).agg(F.avg("perplexity")).collect()
        )
        docs.unpersist()
        extras["hygiene_sec"] = {k: round(v, 3) for k, v in hyg.items()}
        extras["hygiene_docs_per_sec"] = {
            k: round(n_docs / v, 1) for k, v in hyg.items() if v > 0
        }
    except Exception as exc:  # the ER headline must survive a hygiene break
        extras["hygiene_error"] = repr(exc)[:200]

    total = round(sum(timings.values()), 3)

    # Full driver-contract sweep (NOT in the headline total, which keeps the
    # round-1 query set so `value` stays comparable round-over-round): wall
    # time of every queries() entry, so per-query regressions are mechanical
    # to spot between BENCH_r{N}.json files.
    driver_queries: dict[str, float] = {}
    for name, fn in qs.items():
        if name in timings:
            driver_queries[name] = timings[name]
            continue
        driver_queries[name] = best_of(lambda f=fn: f(spark, sf_dir).count())
    extras["driver_queries_sec"] = driver_queries
    extras["driver_queries_total_sec"] = round(sum(driver_queries.values()), 3)
    # Host-interference context: this sandbox VM shows bursty hypervisor
    # CPU steal and page-fault storms (system time) under load; readers
    # comparing rounds should weigh walls by these. steal_pct/sys_pct are
    # the share of ALL cpu jiffies (incl. idle) over the bench window.
    cpu1 = _cpu_snap()
    d = [b - a for a, b in zip(cpu0, cpu1)]
    tot_jiffies = sum(d) or 1
    extras["host_steal_pct"] = round(100 * d[7] / tot_jiffies, 2)
    extras["host_sys_pct"] = round(100 * d[2] / tot_jiffies, 2)
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }
    spark.stop()
    # Full detail first (and to a file), compact headline LAST: the driver
    # captures only the tail of stdout, and round 3's single fat line (59
    # per-query timings) overflowed that window, leaving BENCH_r03.json
    # unparsed. The final stdout line must be a small self-contained JSON
    # object; everything bulky goes above it / to build/bench_detail.json.
    print(json.dumps(out))
    try:
        os.makedirs("build", exist_ok=True)
        with open("build/bench_detail.json", "w") as fh:
            json.dump(out, fh, indent=2)
    except OSError:
        pass
    headline = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "er_fused_convs_per_sec": extras.get("er_fused_convs_per_sec"),
        "er_convs_per_sec": extras.get("er_convs_per_sec"),
        "pairs_scored_per_sec": extras.get("pairs_scored_per_sec"),
        "fs_pairs_scored_per_sec": extras.get("fs_pairs_scored_per_sec"),
        "hamming_pairs_per_sec": extras.get("hamming_pairs_per_sec"),
        "hygiene_docs_per_sec": extras.get("hygiene_docs_per_sec"),
        "driver_queries_total_sec": extras.get("driver_queries_total_sec"),
        "n_driver_queries": len(extras.get("driver_queries_sec", {})),
        "detail": "build/bench_detail.json",
    }
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
