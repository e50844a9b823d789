import sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1])
GC = sys.argv[2] if len(sys.argv) > 2 else "G1"
opts = f"-Xlog:gc:file=/tmp/gc_{CPUS}_{GC}.log -XX:+Use{GC}GC" if GC != "G1" else f"-Xlog:gc:file=/tmp/gc_{CPUS}_{GC}.log"
spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .config("spark.driver.extraJavaOptions", opts)
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo")
from hexspark.pipeline.scoring import hamming_jvm
N = 40000
sigs = (spark.range(0, N, 1, CPUS*4).select(
    F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
    *[F.xxhash64(F.col("id"), F.lit(i)).alias(f"c{i}") for i in range(8)]).persist())
sigs.count()
a = sigs.select(F.col("conv_id").alias("conv_id_a"), *[F.col(f"c{i}").alias(f"c{i}_a") for i in range(8)]).repartition(CPUS*4)
b = sigs.limit(10000).select(F.col("conv_id").alias("conv_id_b"), *[F.col(f"c{i}").alias(f"c{i}_b") for i in range(8)])
q = a.crossJoin(F.broadcast(b)).withColumn("hd", hamming_jvm()).where(F.col("hd") <= 60)
q.count()
t0 = time.monotonic()
for i in range(4):
    q.count()
print(f"cpus={CPUS} gc={GC} {time.monotonic()-t0:.2f}s for 1.6B pairs = {1.6e9/(time.monotonic()-t0)/1e6:.0f}M pairs/s", flush=True)
spark.stop()
