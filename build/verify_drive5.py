import sys
sys.path.insert(0, "/root/repo")
from hexspark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("verify5", master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
from hexspark import fixtures
from hexspark.pipeline import assemble, blocking, clustering, evaluate, scoring
from hexspark.pipeline import simhash as sm

# 1. end-to-end with the window-gated, hash-agg-deduped blocking
tr = fixtures.transcripts_df(spark, n_base=400, seed=42, mutation_rate=0.01)
sigs = sm.signatures(assemble.assemble_conversations(tr)).persist()
wide, stats = blocking.candidate_pairs_wide(sigs, max_block=2000)
edges = scoring.score_wide(wide, max_dist=40)
cc, _ = clustering.connected_components(edges)
clusters = clustering.with_singletons(cc, sigs.select("conv_id"))
labels = fixtures.labeled_pairs_df(spark, tr)
m = evaluate.pairwise_f1(labels, clusters, candidate_pairs=wide.select("conv_id_a", "conv_id_b"))
print(f"[e2e] f1={m['f1']:.4f} tp={m['tp']:.0f} fp={m['fp']:.0f} fn={m['fn']:.0f}")
assert m["f1"] >= 0.99, m

# 2. observe the physical plan at the surface: no SortAggregate, hash-agg dedup
plan = wide._sc._jvm.PythonSQLUtils.explainString(wide._jdf.queryExecution(), "formatted")
print(f"[plan] SortAggregate={'SortAggregate' in plan} HashAggregate={'HashAggregate' in plan} Windows={plan.count('Window (')}")
assert "SortAggregate" not in plan

# 3. probe the window gate's skew semantics: max_block=1 must kill all blocks
wide_tiny, stats_tiny = blocking.candidate_pairs_wide(sigs, max_block=1)
n_pairs_tiny = wide_tiny.count()
n_skipped = stats_tiny.where(F.col("skipped")).count()
print(f"[probe max_block=1] pairs={n_pairs_tiny} skipped_blocks={n_skipped}")
assert n_pairs_tiny == 0 and n_skipped > 0

# 4. probe: dedup exactness — every pair must appear exactly once
dups = wide.groupBy("conv_id_a", "conv_id_b").count().where(F.col("count") > 1).count()
print(f"[probe dedup] duplicate pair rows: {dups}")
assert dups == 0
spark.stop()
print("DRIVE5_COMPLETE")
