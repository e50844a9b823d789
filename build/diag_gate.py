import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from scaling_job import synth_pair_stream
from hexspark.pipeline.scoring import hamming_jvm
N = 2_000_000_000
def mk(s):
    return (synth_pair_stream(spark, N, 128, s)
            .withColumn("hd", hamming_jvm()).where(F.col("hd") <= 20))
mk(0).count()
print("WARM_DONE", flush=True)
t0 = time.monotonic()
mk(1).count()
print(f"cpus={CPUS} gate_only: {time.monotonic()-t0:.2f}s = {N/(time.monotonic()-t0)/1e6:.0f}M pairs/s", flush=True)
spark.stop()
