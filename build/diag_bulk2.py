import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from pyspark.sql import SparkSession
CPUS = int(sys.argv[1])
import os
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1<<30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1<<30))
spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from scaling_job import bulk_score_query
N = 200_000_000
bulk_score_query(spark, N, CPUS*4, 0).count()
best = None
for i in range(1, 3):
    t0 = time.monotonic(); n = bulk_score_query(spark, N, CPUS*4, i).count(); dt = time.monotonic()-t0
    best = dt if best is None or dt < best else best
print(f"cpus={CPUS}: {best:.2f}s = {N/best/1e6:.0f}M pairs/s (matches={n})", flush=True)
spark.stop()
