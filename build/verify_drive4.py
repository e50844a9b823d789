import sys
sys.path.insert(0, "/root/repo")
from hexspark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("verify4", master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
import duckdb

# 1. entry() flagship — now routed through fused fingerprint + wide path
df = E.entry(spark)
rows = df.collect()
multi = [r for r in rows if r.n_members > 1]
print(f"[entry] {len(rows)} clusters, {len(multi)} multi-member, top: {rows[:3]}")
assert len(rows) > 0

# 2. signature determinism across the tokenizer change: run signatures twice
#    on the same docs in two separate plans -> identical sig_hex
from hexspark.pipeline.simhash import signatures
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
    F.col("doc_id").cast("string").alias("conv_id"), F.col("text").alias("doc_text"), F.lit(1).alias("n_turns"))
s1 = {r.conv_id: r.sig_hex for r in signatures(docs).collect()}
s2 = {r.conv_id: r.sig_hex for r in signatures(docs.repartition(7)).collect()}
print(f"[determinism] {len(s1)} sigs, identical across partitionings: {s1 == s2}")
assert s1 == s2
# long-token probe: tokens >16 bytes exercise the capped-loop boundary
probe = spark.createDataFrame(
    [("t1", "supercalifragilisticexpialidocious antidisestablishmentarianism xy", 1),
     ("t2", "supercalifragilisticexpialidociousEXTRA antidisestablishmentarianism xy", 1)],
    "conv_id string, doc_text string, n_turns int")
pr = {r.conv_id: r.sig_hex for r in signatures(probe).collect()}
print(f"[probe] long-token sigs differ (len-mix beyond 16-byte cap): {pr['t1'] != pr['t2']}")

# 3. embedding_neardup through the contract vs oracle
sf = "/root/testdata/sf0.01"
srows = sorted((r.vec_id_a, r.vec_id_b, r.sim) for r in E.queries()["embedding_neardup"](spark, sf).collect())
con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
orows = sorted((a, b, s) for a, b, s in con.execute(E.oracle_sql()["embedding_neardup"]).fetchall())
print(f"[oracle] spark={len(srows)} duckdb={len(orows)} equal={srows == orows}")
assert srows == orows

# 4. probe: LSH mode on the same real embeddings — subset of exact, sims above threshold
from hexspark.ops.ann import embedding_neardup_pairs
emb = spark.read.parquet(f"{sf}/embeddings.parquet")
lsh = embedding_neardup_pairs(emb, threshold=0.4, method="lsh", n_tables=8).collect()
exact_set = {(a, b) for a, b, _ in srows}
lsh_set = {(r.vec_id_a, r.vec_id_b) for r in lsh}
print(f"[lsh-probe] lsh={len(lsh_set)} pairs, subset_of_exact={lsh_set <= exact_set}, recall={len(lsh_set & exact_set)/max(len(exact_set),1):.2f}")
assert lsh_set <= exact_set
spark.stop()
print("DRIVE4_COMPLETE")
