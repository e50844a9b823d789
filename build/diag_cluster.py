import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CORES = int(sys.argv[1])
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000_000
import os
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1<<30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1<<30))
spark = (SparkSession.builder.master("spark://127.0.0.1:7077")
    .appName(f"gate-{CORES}")
    .config("spark.executor.cores", "4")
    .config("spark.executor.memory", "10g")
    .config("spark.cores.max", str(CORES))
    .config("spark.executorEnv.PYTHONPATH", "/root/repo:/root/repo/scripts")
    .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", str(1<<30))
    .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", str(1<<30))
    .config("spark.sql.shuffle.partitions", str(CORES*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from scaling_job import synth_pair_stream
from hexspark.pipeline.scoring import hamming_jvm
def mk(s):
    return (synth_pair_stream(spark, N, 128, s)
            .withColumn("hd", hamming_jvm()).where(F.col("hd") <= 20))
mk(0).count()
best = None
for i in (1, 2):
    t0 = time.monotonic(); mk(i).count(); dt = time.monotonic()-t0
    best = dt if best is None or dt < best else best
print(f"cores={CORES} gate_only: {best:.2f}s = {N/best/1e6:.0f}M pairs/s", flush=True)
spark.stop()
