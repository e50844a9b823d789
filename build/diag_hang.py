import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hexspark.pipeline.scoring import hamming_jvm
print("session up", flush=True)
N_SIGS = 36000
sigs = spark.range(0, N_SIGS, 1, 64).select(
    F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
    *[F.xxhash64(F.col("id"), F.lit(i)).alias(f"c{i}") for i in range(8)])
print("sigs count:", sigs.count(), flush=True)
pairs = spark.range(0, 1_000_000, 1, 32).select(
    F.concat(F.lit("c"), F.pmod(F.xxhash64("id"), F.lit(N_SIGS))).alias("conv_id_a"),
    F.concat(F.lit("c"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_SIGS))).alias("conv_id_b"),
)
print("pairs count:", pairs.count(), flush=True)
sa = sigs.select(F.col("conv_id").alias("conv_id_a"), *[F.col(f"c{i}").alias(f"c{i}_a") for i in range(8)])
j1 = pairs.join(F.broadcast(sa), "conv_id_a")
print("join1 count:", j1.count(), flush=True)
sb = sigs.select(F.col("conv_id").alias("conv_id_b"), *[F.col(f"c{i}").alias(f"c{i}_b") for i in range(8)])
j2 = j1.join(F.broadcast(sb), "conv_id_b")
print("join2 count:", j2.count(), flush=True)
q = j2.withColumn("hd", hamming_jvm()).where(F.col("hd") <= 60)
print("scored count:", q.count(), flush=True)
spark.stop()
