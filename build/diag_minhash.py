import sys, time
sys.path.insert(0, "/root/repo")
from hexspark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("mh", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
from hexspark.ops.dedup import minhash_pairs, minhash_signature
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
print("docs:", docs.count())
t0 = time.monotonic()
sig = docs.select(F.col("doc_id"), F.posexplode(minhash_signature(F.col("text"), 8)).alias("perm", "mh"))
n = sig.count()
print(f"signature+explode: {time.monotonic()-t0:.1f}s ({n} rows)")
t0 = time.monotonic()
out = minhash_pairs(docs, k=8, max_block=1_000_000_000)
print(f"full minhash_pairs: {out.count()} pairs in {time.monotonic()-t0:.1f}s")
avg = docs.select(F.avg(F.size(F.split("text", " ")))).collect()[0][0]
print(f"avg tokens/doc: {avg:.0f}")
spark.stop()
