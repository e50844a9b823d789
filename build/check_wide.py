import sys, time
sys.path.insert(0, "/root/repo")
from hexspark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("widecheck", master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
from hexspark import fixtures
from hexspark.pipeline import assemble, blocking, scoring
from hexspark.pipeline import simhash as sm
tr = fixtures.transcripts_df(spark, n_base=400, seed=42, mutation_rate=0.01)
sigs = sm.signatures(assemble.assemble_conversations(tr)).persist()
sigs.count()

p_thin, _ = blocking.candidate_pairs(sigs)
e_old = scoring.score_and_match(p_thin, sigs, max_dist=40).select(
    "conv_id_a", "conv_id_b", "hamming_dist", F.round("jw", 9).alias("jw")).persist()
p_wide, _ = blocking.candidate_pairs_wide(sigs)
e_new = scoring.score_wide(p_wide, max_dist=40).select(
    "conv_id_a", "conv_id_b", "hamming_dist", F.round("jw", 9).alias("jw")).persist()
n_old, n_new = e_old.count(), e_new.count()
diff = e_old.exceptAll(e_new).count() + e_new.exceptAll(e_old).count()
print(f"old={n_old} new={n_new} symdiff={diff}")
assert diff == 0 and n_old == n_new
print("WIDE PATH EXACT MATCH")
spark.stop()
