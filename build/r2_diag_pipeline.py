"""Round-2 diagnosis: pipeline stage walls vs core count, with event logs.

Runs ONLY generate+fingerprint+blocking+scoring+clustering (no bulk) on the
same seeded input, in local[N] mode, writing Spark event logs so per-task
metrics can be compared between core counts.

Usage: python build/r2_diag_pipeline.py <cpus> <out.json>
"""
import json
import os
import sys
import time

cpus = int(sys.argv[1])
out_path = sys.argv[2]
evdir = f"/tmp/r2-ev-{cpus}"
os.makedirs(evdir, exist_ok=True)

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))

from pyspark.sql import SparkSession

builder = (
    SparkSession.builder.appName(f"r2diag-{cpus}")
    .master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(cpus * 2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    .config("spark.ui.enabled", "false")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", evdir)
    .config("spark.eventLog.compress", "false")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.session.timeZone", "UTC")
)
for kv in os.environ.get("EXTRA_CONF", "").split(";"):
    if kv.strip():
        k, v = kv.split("=", 1)
        builder = builder.config(k, v)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
from hexspark import fixtures
from hexspark.pipeline import assemble, blocking, clustering, scoring
from hexspark.pipeline import simhash as simhash_mod

t = {}


def timed(name, fn):
    t0 = time.monotonic()
    out = fn()
    t[name] = round(time.monotonic() - t0, 3)
    print(f"  {name}: {t[name]}s", flush=True)
    return out


n_base = int(os.environ.get("NB", "12000"))
tr = fixtures.transcripts_df(spark, n_base=n_base, seed=42, mutation_rate=0.01,
                             partitions=64).persist()
n_turns = timed("generate", tr.count)

sigs = simhash_mod.signatures(assemble.assemble_conversations(tr)).persist()
n_convs = timed("fingerprint", sigs.count)

pairs_wide = blocking.candidate_pairs_wide(sigs)[0].persist()
n_pairs = timed("blocking", pairs_wide.count)

edges = scoring.score_wide(pairs_wide, max_dist=40).persist()
n_edges = timed("scoring", edges.count)


def run_cc():
    cc, rounds = clustering.connected_components(edges)
    clusters = clustering.with_singletons(cc, sigs.select("conv_id"))
    return clusters.count(), rounds


(n_clusters, rounds) = timed("clustering", run_cc)

out = {"cpus": cpus, "timings": t, "n_turns": n_turns, "n_convs": n_convs,
       "n_pairs": n_pairs, "n_edges": n_edges, "evdir": evdir,
       "app_id": spark.sparkContext.applicationId}
with open(out_path, "w") as f:
    json.dump(out, f)
print(json.dumps(out))
spark.stop()
