"""End-to-end drive of the changed fingerprint path through the real
surfaces: __spark_entry__.entry(), the ER pipeline with F1 eval, and
probes (empty/unicode/null doc_text)."""
import sys, time
sys.path.insert(0, "/root/repo")
from hexspark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("verify", master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

# 1. driver-contract flagship query
import __spark_entry__ as E
df = E.entry(spark)
rows = df.limit(5).collect()
print(f"[entry] rows>=0: {df.count()} schema: {df.schema.simpleString()}")
print("[entry] sample:", rows[:2])

# 2. full ER pipeline + pairwise F1 vs ground truth
from hexspark import fixtures
from hexspark.pipeline import assemble, blocking, clustering, evaluate, scoring
from hexspark.pipeline import simhash as sm
tr = fixtures.transcripts_df(spark, n_base=400, seed=42, mutation_rate=0.01)
convs = assemble.assemble_conversations(tr)
sigs = sm.signatures(convs).persist()
pairs, _ = blocking.candidate_pairs(sigs)
edges = scoring.score_and_match(pairs, sigs, max_dist=40)
cc, rounds = clustering.connected_components(edges)
clusters = clustering.with_singletons(cc, sigs.select("conv_id"))
labels = fixtures.labeled_pairs_df(spark, tr)
m = evaluate.pairwise_f1(labels, clusters, candidate_pairs=pairs.select("conv_id_a", "conv_id_b"))
print(f"[pipeline] clusters={clusters.count()} cc_rounds={rounds} metrics={m}")
assert m["f1"] >= 0.99, f"F1 too low: {m}"

# 3. probe: empty doc, unicode text, many-空 rows through signatures
probe = spark.createDataFrame(
    [("c_empty", "", 1), ("c_uni", "héllo wörld 北京 abc123 ABC!", 1),
     ("c_space", "   ", 1), ("c_ascii", "The Quick?? Brown--fox", 2)],
    "conv_id string, doc_text string, n_turns int")
out = sm.signatures(probe).collect()
for r in sorted(out, key=lambda r: r.conv_id):
    print(f"[probe] {r.conv_id!r}: sig_hex={r.sig_hex[:16]}... canon={r.canon!r} n_chars={r.n_chars}")
# canon parity vs JVM expression on the probe rows
jvm = probe.select("conv_id",
    F.substring(F.regexp_replace(F.lower("doc_text"), "[^a-z0-9 ]", ""), 1, 48).alias("cj"),
    F.length("doc_text").cast("long").alias("nj")).collect()
jm = {r.conv_id: (r.cj, r.nj) for r in jvm}
for r in out:
    cj, nj = jm[r.conv_id]
    status = "OK" if (r.canon == cj and r.n_chars == nj) else f"MISMATCH jvm=({cj!r},{nj})"
    print(f"[parity] {r.conv_id}: {status}")
spark.stop()
print("DRIVE_COMPLETE")
