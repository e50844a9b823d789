import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1])

def cj():
    with open("/proc/stat") as f:
        p = f.readline().split()
    v = [int(x) for x in p[1:9]]
    return v[0]+v[1]+v[2]+v[5]+v[6]

spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hexspark import fixtures
from hexspark.pipeline import assemble
from hexspark.pipeline import simhash as sm
tr = fixtures.transcripts_df(spark, n_base=12000, seed=42, mutation_rate=0.01, partitions=64).persist()
tr.count()
sigs = sm.signatures(assemble.assemble_conversations(tr))
c0, t0 = cj(), time.monotonic()
sigs.agg(F.sum(F.length("sig_hex") + F.length("canon") + F.col("n_chars"))).collect()
dt = time.monotonic()-t0
print(f"cpus={CPUS} sigs_full: {dt:.1f}s cpu={(cj()-c0)/100:.0f}s", flush=True)
c0, t0 = cj(), time.monotonic()
p = sigs.persist(); n = p.count()
dt = time.monotonic()-t0
print(f"cpus={CPUS} sigs_persist: {dt:.1f}s cpu={(cj()-c0)/100:.0f}s n={n}", flush=True)
spark.stop()
