import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(sys.argv[1])
N = 2_000_000_000

def cpu_jiffies():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    return vals[0] + vals[1] + vals[2] + vals[5] + vals[6]

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = spark.range(0, N, 1, CPUS * 4)
q = df.select(F.sum(F.bit_count(F.xxhash64("id"))).alias("s"))
for run in ("cold", "warm"):
    c0, t0 = cpu_jiffies(), time.monotonic()
    q.collect()
    dt = time.monotonic() - t0
    dc = (cpu_jiffies() - c0) / 100.0
    print(f"{run} cpus={CPUS} wall={dt:.2f} cpu={dc:.1f} eff={dc/dt:.1f} rate={N/dt/1e6:.0f}M rows/s", flush=True)
spark.stop()
