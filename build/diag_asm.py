import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
CPUS = int(sys.argv[1])
JAVAOPTS = sys.argv[2] if len(sys.argv) > 2 else ""

def cpu_jiffies():
    with open("/proc/stat") as f:
        p = f.readline().split()
    v = [int(x) for x in p[1:9]]
    return v[0]+v[1]+v[2]+v[5]+v[6]

b = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g"))
if JAVAOPTS:
    b = b.config("spark.driver.extraJavaOptions", JAVAOPTS)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from hexspark import fixtures
from hexspark.pipeline import assemble
tr = fixtures.transcripts_df(spark, n_base=12000, seed=42, mutation_rate=0.01, partitions=64).persist()
tr.count()
q = assemble.assemble_conversations(tr)
q.count()  # warm
c0, t0 = cpu_jiffies(), time.monotonic()
q.count()
dt = time.monotonic()-t0
print(f"cpus={CPUS} opts='{JAVAOPTS}' assemble_warm: {dt:.1f}s cpu={(cpu_jiffies()-c0)/100:.0f}s", flush=True)
spark.stop()
