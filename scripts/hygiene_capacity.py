"""Capacity-point run of the staged corpus-hygiene pipeline
(pipeline/corpus.CorpusRunner): scrub -> quality -> dedup -> mixture over
a 16x-sf0.1 documents input (~80k docs), per-stage walls from the
runner's own manifest. The hygiene counterpart to the ER pipeline's
16x capacity run (build/scaling_cap32.json).

Input scaling is deterministic and content-preserving: the sf0.1
documents table unioned 16 times with doc_id offsets of 10^7 per
replica and a per-replica marker word appended to the text (so exact
dedup does NOT collapse the replicas into one survivor each — the
dedup stage still sees the corpus's organic duplicate rate at 16x the
volume, which is the capacity question being asked; replicas with
UNCHANGED text would make stage 3 degenerate to a 16-way pile-up).

Usage: python scripts/hygiene_capacity.py [sf_dir] [cpus] [scale]
Writes build/hygiene_capacity.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hexspark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    spark = get_spark(
        "hygiene-capacity",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions": "-Xms14g -XX:+AlwaysPreTouch",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from hexspark.pipeline.corpus import CorpusConfig, CorpusRunner

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = None
    for r in range(scale):
        rep = base.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{r}")).alias("text"),
            "lang",
        )
        reps = rep if reps is None else reps.unionByName(rep)
    docs = reps.repartition(cpus * 2).persist()
    n_in = docs.count()  # materialize: generation is harness cost

    wd = tempfile.mkdtemp(prefix="hyg_cap_")
    cfg = CorpusConfig(
        max_perplexity=5000.0,
        near_dup=True,
        max_span_dup_frac=0.5,
        mixture_weights={"en": 0.5, "de": 0.2, "fr": 0.2, "es": 0.1},
    )
    runner = CorpusRunner(spark, wd, cfg)
    t0 = time.monotonic()
    result = runner.run(docs)
    wall = time.monotonic() - t0

    manifest = runner._manifest()
    stages = {
        s: {"rows": v["rows"], "wall_sec": round(v["wall_ms"] / 1000, 3)}
        for s, v in manifest["completed"].items()
    }
    out = {
        "metric": "hygiene_capacity",
        "sf_dir": sf_dir,
        "scale": scale,
        "cpus": cpus,
        "n_docs_in": n_in,
        "total_wall_sec": round(wall, 3),
        "docs_per_sec": round(n_in / wall, 1),
        "stages": stages,
        "stage_rows": result.stage_rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "build", "hygiene_capacity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
