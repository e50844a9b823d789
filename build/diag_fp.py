import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1])

def cpu_jiffies():
    with open("/proc/stat") as f:
        p = f.readline().split()
    v = [int(x) for x in p[1:9]]
    return v[0]+v[1]+v[2]+v[5]+v[6]

spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hexspark import fixtures
from hexspark.pipeline import assemble
from hexspark.pipeline import simhash as simhash_mod

tr = fixtures.transcripts_df(spark, n_base=12000, seed=42, mutation_rate=0.01, partitions=64).persist()
c0, t0 = cpu_jiffies(), time.monotonic()
n = tr.count()
print(f"generate: {time.monotonic()-t0:.1f}s cpu={(cpu_jiffies()-c0)/100:.0f}s n={n}", flush=True)

convs = assemble.assemble_conversations(tr).persist()
c0, t0 = cpu_jiffies(), time.monotonic()
nc = convs.count()
print(f"assemble: {time.monotonic()-t0:.1f}s cpu={(cpu_jiffies()-c0)/100:.0f}s n={nc}", flush=True)

sigs = simhash_mod.signatures(convs)
c0, t0 = cpu_jiffies(), time.monotonic()
ns = sigs.count()
dt = time.monotonic()-t0
print(f"simhash: {dt:.1f}s cpu={(cpu_jiffies()-c0)/100:.0f}s eff_cores={(cpu_jiffies()-c0)/100/dt:.1f} n={ns}", flush=True)
spark.stop()
