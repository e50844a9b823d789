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
from hexspark.pipeline import simhash as simhash_mod
tr = fixtures.transcripts_df(spark, n_base=12000, seed=42, mutation_rate=0.01, partitions=64).persist()
tr.count()

def t(name, df, col):
    c0, t0 = cj(), time.monotonic()
    df.agg(F.sum(col).alias("s")).collect()
    dt = time.monotonic()-t0
    print(f"cpus={CPUS} {name}: {dt:.1f}s cpu={(cj()-c0)/100:.0f}s", flush=True)

ordered = F.sort_array(F.collect_list(F.struct("turn_idx", "text")))
arr_only = tr.groupBy("conv_id").agg(ordered.alias("arr"))
t("collect_sort", arr_only, F.size("arr"))

doc = F.array_join(F.transform(ordered, lambda s: s["text"]), " ")
doc_df = tr.groupBy("conv_id").agg(doc.alias("doc_text"))
t("doc_join", doc_df, F.length("doc_text"))

convs = assemble.assemble_conversations(tr)
t("assemble_full", convs, F.length("doc_text") + F.length("canon"))

sigs = simhash_mod.signatures(convs)
t("sigs_full", sigs, F.length("sig_hex") + F.length("canon"))
spark.stop()
