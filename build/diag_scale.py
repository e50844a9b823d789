"""Diagnose scaling: pure-JVM hamming crossJoin at a given core count.

Measures wall time and machine-wide CPU-seconds (from /proc/stat) for each
stage so we can see effective parallelism directly.
"""
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(sys.argv[1])
N = int(sys.argv[2]) if len(sys.argv) > 2 else 40000
PAIRS_TARGET = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000_000


def cpu_jiffies():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal
    vals = [int(x) for x in parts[1:9]]
    busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
    return busy


def timed(name, fn):
    c0, t0 = cpu_jiffies(), time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    dc = (cpu_jiffies() - c0) / 100.0  # jiffies -> sec (HZ=100)
    print(json.dumps({"stage": name, "wall": round(dt, 3),
                      "cpu_sec": round(dc, 1),
                      "eff_cores": round(dc / dt, 1) if dt > 0 else 0,
                      "result": out}), flush=True)
    return out


spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS * 2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from hexspark.pipeline.scoring import _JW_SCHEMA, _jw_batches, hamming_jvm

# synthetic signatures: 8 random-ish longs per row, plus a canon string
sigs = (
    spark.range(0, N, 1, CPUS * 4)
    .select(
        F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
        F.substring(F.md5(F.col("id").cast("string")), 1, 32).alias("canon"),
        *[
            F.xxhash64(F.col("id"), F.lit(i)).alias(f"c{i}")
            for i in range(8)
        ],
    )
    .persist()
)
timed("gen", sigs.count)

n_probe = max(PAIRS_TARGET // N, 1)
a = sigs.select(
    F.col("conv_id").alias("conv_id_a"), F.col("canon").alias("canon_a"),
    *[F.col(f"c{i}").alias(f"c{i}_a") for i in range(8)],
).repartition(CPUS * 4)
b = sigs.limit(n_probe).select(
    F.col("conv_id").alias("conv_id_b"), F.col("canon").alias("canon_b"),
    *[F.col(f"c{i}").alias(f"c{i}_b") for i in range(8)],
)
bulk = a.crossJoin(F.broadcast(b))

# stage 1: pure JVM codegen hamming + filter + count
def jvm_only():
    return (
        bulk.withColumn("hd", hamming_jvm())
        .where(F.col("hd") <= 60)
        .count()
    )

timed("jvm_cold", jvm_only)
timed("jvm_warm", jvm_only)

# stage 2: with the neq filter like the real job
def jvm_neq():
    return (
        bulk.where(F.col("conv_id_a") != F.col("conv_id_b"))
        .withColumn("hd", hamming_jvm())
        .where(F.col("hd") <= 60)
        .count()
    )

timed("jvm_neq", jvm_neq)

# stage 3: full path incl mapInArrow JW on survivors (loose gate -> many rows cross)
def full(gate):
    return (
        bulk.withColumn("hamming_dist", hamming_jvm())
        .where(F.col("hamming_dist") <= gate)
        .select("conv_id_a", "conv_id_b", "hamming_dist", "canon_a", "canon_b")
        .mapInArrow(_jw_batches(0.75), _JW_SCHEMA)
        .where(F.col("score") >= 0.5)
        .count()
    )

timed("full_tight_cold", lambda: full(60))
timed("full_tight_warm", lambda: full(60))
spark.stop()
