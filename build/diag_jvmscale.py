import sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
N = 8_000_000_000
q = spark.range(0, N, 1, CPUS * 4).where(F.bit_count(F.xxhash64("id")) > 44).select(F.count(F.lit(1)))
q.collect()
best = None
for _ in range(3):
    t0 = time.monotonic()
    q.collect()
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best
print(f"cpus={CPUS}: {best:.2f}s = {N/best/1e9:.1f}B rows/s", flush=True)
spark.stop()
