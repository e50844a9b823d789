import sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1])
N = 40000
spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
from hexspark.pipeline.scoring import hamming_jvm
sigs = (spark.range(0, N, 1, CPUS*4).select(
    F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
    *[F.xxhash64(F.col("id"), F.lit(i)).alias(f"c{i}") for i in range(8)]).persist())
sigs.count()
a = sigs.select(F.col("conv_id").alias("conv_id_a"), *[F.col(f"c{i}").alias(f"c{i}_a") for i in range(8)]).repartition(CPUS*4)
b = sigs.limit(10000).select(F.col("conv_id").alias("conv_id_b"), *[F.col(f"c{i}").alias(f"c{i}_b") for i in range(8)])
bulk = a.crossJoin(F.broadcast(b))
q = bulk.withColumn("hd", hamming_jvm()).where(F.col("hd") <= 60)
q.count()  # warm
print("LOOP_START", flush=True)
t0 = time.monotonic()
for i in range(8):
    q.count()
print(f"LOOP_DONE {time.monotonic()-t0:.2f}s for 8 iters of 400M pairs", flush=True)
spark.stop()
