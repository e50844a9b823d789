import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1]); JOPTS = sys.argv[2] if len(sys.argv) > 2 else ""
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
sys.path.insert(0, "/root/repo/scripts")
from scaling_job import synth_pair_stream
from hexspark.pipeline import scoring
N = 100_000_000
def mk(s):
    return (synth_pair_stream(spark, N, CPUS*4, s)
            .withColumn("hd", scoring.hamming_jvm()).where(F.col("hd") <= 20))
mk(0).count()
best = None
for i in range(1, 3):
    t0 = time.monotonic(); mk(i).count(); dt = time.monotonic()-t0
    best = dt if best is None or dt < best else best
print(f"cpus={CPUS} opts='{JOPTS[:40]}' gen_jvm: {best:.2f}s = {N/best/1e6:.0f}M pairs/s", flush=True)
spark.stop()
