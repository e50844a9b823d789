import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS, MODE = int(sys.argv[1]), sys.argv[2]

def cj():
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
tr = fixtures.transcripts_df(spark, n_base=12000, seed=42, mutation_rate=0.01, partitions=64).persist()
tr.count()
q = assemble.assemble_conversations(tr)
if MODE == "persist":
    q = q.persist()
elif MODE == "nocanon":
    ordered = F.sort_array(F.collect_list(F.struct("turn_idx", "text")))
    doc = F.array_join(F.transform(ordered, lambda s: s["text"]), " ")
    q = tr.groupBy("conv_id").agg(doc.alias("doc_text"))
elif MODE == "nohof":
    ordered = F.sort_array(F.collect_list(F.struct("turn_idx", "text")))
    q = tr.groupBy("conv_id").agg(ordered.alias("arr"))
elif MODE == "plaincount":
    q = tr.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
c0, t0 = cj(), time.monotonic()
n = q.count()
dt = time.monotonic()-t0
print(f"cpus={CPUS} mode={MODE}: {dt:.1f}s cpu={(cj()-c0)/100:.0f}s n={n}", flush=True)
spark.stop()
