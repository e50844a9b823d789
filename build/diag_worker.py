import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
import pyarrow as pa
CPUS = int(sys.argv[1])

def cj():
    with open("/proc/stat") as f:
        p = f.readline().split()
    v = [int(x) for x in p[1:9]]
    return v[0]+v[1]+v[2]+v[5]+v[6]

spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

def ident(batches):
    for b in batches:
        yield b

df = spark.range(0, 10000, 1, CPUS * 2).select(F.col("id"))
q = df.mapInArrow(ident, "id long")
for run in ("cold", "warm"):
    c0, t0 = cj(), time.monotonic()
    q.agg(F.sum("id")).collect()
    dt = time.monotonic() - t0
    print(f"cpus={CPUS} {run}_identity_mapInArrow: {dt:.1f}s cpu={(cj()-c0)/100:.0f}s", flush=True)
# with numpy+pandas import inside the UDF
def heavy(batches):
    import numpy, pandas
    for b in batches:
        yield b
q2 = df.mapInArrow(heavy, "id long")
c0, t0 = cj(), time.monotonic()
q2.agg(F.sum("id")).collect()
print(f"cpus={CPUS} heavy_import: {time.monotonic()-t0:.1f}s cpu={(cj()-c0)/100:.0f}s", flush=True)
spark.stop()
