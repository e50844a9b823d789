import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.storagelevel import StorageLevel
CPUS, MODE = int(sys.argv[1]), sys.argv[2]

def cj():
    with open("/proc/stat") as f:
        p = f.readline().split()
    v = [int(x) for x in p[1:9]]
    return v[0]+v[1]+v[2]+v[5]+v[6]

b = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g"))
if MODE == "nocompress":
    b = b.config("spark.sql.inMemoryColumnarStorage.compressed", "false")
if MODE == "smallbatch":
    b = b.config("spark.sql.inMemoryColumnarStorage.batchSize", "1000")
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from hexspark import fixtures
from hexspark.pipeline import assemble
from hexspark.pipeline import simhash as simhash_mod
tr = fixtures.transcripts_df(spark, n_base=12000, seed=42, mutation_rate=0.01, partitions=64).persist()
tr.count()
sigs = simhash_mod.signatures(assemble.assemble_conversations(tr))
if MODE == "disk":
    sigs = sigs.persist(StorageLevel.DISK_ONLY)
elif MODE != "nopersist":
    sigs = sigs.persist()
c0, t0 = cj(), time.monotonic()
n = sigs.count()
dt = time.monotonic()-t0
print(f"cpus={CPUS} mode={MODE}: {dt:.1f}s cpu={(cj()-c0)/100:.0f}s n={n}", flush=True)
spark.stop()
