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
N_SIGS, N = 36000, 100_000_000
sigs = spark.range(0, N_SIGS, 1, 64).select(
    F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
    *[F.xxhash64(F.col("id"), F.lit(i)).alias(f"c{i}") for i in range(8)])
sa = sigs.select(F.col("conv_id").alias("conv_id_a"), *[F.col(f"c{i}").alias(f"c{i}_a") for i in range(8)])
sb = sigs.select(F.col("conv_id").alias("conv_id_b"), *[F.col(f"c{i}").alias(f"c{i}_b") for i in range(8)])

def pairs(s):
    return spark.range(0, N, 1, CPUS*4).select(
        F.concat(F.lit("c"), F.pmod(F.xxhash64("id", F.lit(s)), F.lit(N_SIGS))).alias("conv_id_a"),
        F.concat(F.lit("c"), F.pmod(F.xxhash64("id", F.lit(s+100)), F.lit(N_SIGS))).alias("conv_id_b"))

def timeit(name, mk, reps=2):
    mk(0).count()
    best = None
    for i in range(1, reps+1):
        t0 = time.monotonic(); mk(i).count(); dt = time.monotonic()-t0
        best = dt if best is None or dt < best else best
    print(f"cpus={CPUS} {name}: {best:.2f}s = {N/best/1e6:.0f}M rows/s", flush=True)

timeit("gen_only", lambda s: pairs(s))
timeit("gen_join1", lambda s: pairs(s).join(F.broadcast(sa), "conv_id_a"))
timeit("gen_join2", lambda s: pairs(s).join(F.broadcast(sa), "conv_id_a").join(F.broadcast(sb), "conv_id_b"))
timeit("full", lambda s: pairs(s).join(F.broadcast(sa), "conv_id_a").join(F.broadcast(sb), "conv_id_b")
       .withColumn("hd", hamming_jvm()).where(F.col("hd") <= 60))
spark.stop()
