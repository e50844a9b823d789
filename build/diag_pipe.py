import sys, time
sys.path.insert(0, "/root/repo")
from hexspark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("pipe", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
from hexspark import fixtures
from hexspark.pipeline import assemble, blocking, clustering, scoring
from hexspark.pipeline import simhash as sm

def t(name, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{name}: {time.monotonic()-t0:.2f}s", flush=True)
    return out

tr = fixtures.transcripts_df(spark, n_base=2000, seed=42, mutation_rate=0.01)
sigs = sm.signatures(assemble.assemble_conversations(tr)).persist()
t("gen+assemble+simhash", sigs.count)
pw, _ = blocking.candidate_pairs_wide(sigs)
pw = pw.persist()
t("blocking_wide", pw.count)
edges = scoring.score_wide(pw, max_dist=40).persist()
t("scoring", edges.count)
def cc():
    c, r = clustering.connected_components(edges)
    return clustering.with_singletons(c, sigs.select("conv_id")).count()
t("clustering", cc)
spark.stop()
