import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hexspark.pipeline.scoring import hamming_jvm

def timeit(name, mk, n_items, reps=3):
    mk(0).count()  # warm codegen+JIT
    best = None
    for i in range(1, reps + 1):
        t0 = time.monotonic()
        mk(i).count()
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    print(f"cpus={CPUS} {name}: best={best:.2f}s = {n_items/best/1e6:.0f}M items/s", flush=True)

# probe 1: pure codegen hash+filter (fresh salt per rep defeats reuse)
N1 = 4_000_000_000
timeit("hashfilter", lambda s: spark.range(0, N1, 1, CPUS*4)
       .where(F.bit_count(F.xxhash64("id", F.lit(s))) > 44), N1)

# probe 2: join-based pair scoring, string keys
N_SIGS, N2 = 36000, 200_000_000
sigs = spark.range(0, N_SIGS, 1, 64).select(
    F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
    *[F.xxhash64(F.col("id"), F.lit(i)).alias(f"c{i}") for i in range(8)])
sa = sigs.select(F.col("conv_id").alias("conv_id_a"), *[F.col(f"c{i}").alias(f"c{i}_a") for i in range(8)])
sb = sigs.select(F.col("conv_id").alias("conv_id_b"), *[F.col(f"c{i}").alias(f"c{i}_b") for i in range(8)])
def mk_pairs(s):
    pairs = spark.range(0, N2, 1, CPUS*4).select(
        F.concat(F.lit("c"), F.pmod(F.xxhash64("id", F.lit(s)), F.lit(N_SIGS))).alias("conv_id_a"),
        F.concat(F.lit("c"), F.pmod(F.xxhash64("id", F.lit(s + 100)), F.lit(N_SIGS))).alias("conv_id_b"))
    return (pairs.join(F.broadcast(sa), "conv_id_a").join(F.broadcast(sb), "conv_id_b")
            .withColumn("hd", hamming_jvm()).where(F.col("hd") <= 60))
timeit("join_score_str", mk_pairs, N2)
spark.stop()
