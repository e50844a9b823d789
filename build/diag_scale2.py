import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1])
JOPTS = sys.argv[2] if len(sys.argv) > 2 else ""
N_PAIRS = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000_000

def cj():
    with open("/proc/stat") as f:
        p = f.readline().split()
    v = [int(x) for x in p[1:9]]
    return v[0]+v[1]+v[2]+v[5]+v[6]

import os
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1<<30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1<<30))
b = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g"))
if JOPTS:
    b = b.config("spark.driver.extraJavaOptions", JOPTS)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from hexspark.pipeline.scoring import hamming_jvm

N_SIGS = 36000
sigs = spark.range(0, N_SIGS, 1, 64).select(
    F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
    *[F.xxhash64(F.col("id"), F.lit(i)).alias(f"c{i}") for i in range(8)])

# join-based scoring: each pair row looks up both sides in the broadcast
# hash map (4MB, L2-resident), then codegen hamming — per-pair data private
pairs = spark.range(0, N_PAIRS, 1, CPUS * 4).select(
    F.concat(F.lit("c"), F.pmod(F.xxhash64("id"), F.lit(N_SIGS))).alias("conv_id_a"),
    F.concat(F.lit("c"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_SIGS))).alias("conv_id_b"),
)
sa = sigs.select(F.col("conv_id").alias("conv_id_a"), *[F.col(f"c{i}").alias(f"c{i}_a") for i in range(8)])
sb = sigs.select(F.col("conv_id").alias("conv_id_b"), *[F.col(f"c{i}").alias(f"c{i}_b") for i in range(8)])
q = (pairs.join(F.broadcast(sa), "conv_id_a").join(F.broadcast(sb), "conv_id_b")
     .withColumn("hd", hamming_jvm()).where(F.col("hd") <= 60))
q.count()
best = None
for i in range(3):
    c0, t0 = cj(), time.monotonic()
    q.count()
    dt = time.monotonic()-t0
    best = dt if best is None or dt < best else best
print(f"cpus={CPUS} opts='{JOPTS}' join-scored {N_PAIRS/1e9:.1f}B pairs best={best:.1f}s = {N_PAIRS/best/1e6:.0f}M pairs/s", flush=True)
spark.stop()
