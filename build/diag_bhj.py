import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
MODE = sys.argv[1]
spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hexspark.pipeline.scoring import hamming_jvm
N_SIGS, N_PAIRS = 36000, 1_000_000
key = (lambda c: F.concat(F.lit("c"), c)) if "str" in MODE else (lambda c: c)
sigs = spark.range(0, N_SIGS, 1, 64).select(
    key(F.col("id")).alias("conv_id"),
    *[F.xxhash64(F.col("id"), F.lit(i)).alias(f"c{i}") for i in range(8)])
pairs = spark.range(0, N_PAIRS, 1, 32).select(
    key(F.pmod(F.xxhash64("id"), F.lit(N_SIGS))).alias("conv_id_a"),
    key(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_SIGS))).alias("conv_id_b"),
)
sa = sigs.select(F.col("conv_id").alias("conv_id_a"), *[F.col(f"c{i}").alias(f"c{i}_a") for i in range(8)])
sb = sigs.select(F.col("conv_id").alias("conv_id_b"), *[F.col(f"c{i}").alias(f"c{i}_b") for i in range(8)])
if "one" in MODE:
    q = pairs.join(F.broadcast(sa), "conv_id_a")
else:
    q = pairs.join(F.broadcast(sa), "conv_id_a").join(F.broadcast(sb), "conv_id_b")
if "ham" in MODE:
    q = q.withColumn("hd", hamming_jvm()).where(F.col("hd") <= 60)
t0 = time.monotonic()
n = q.count()
print(f"mode={MODE}: {time.monotonic()-t0:.1f}s n={n}", flush=True)
spark.stop()
