import sys
sys.path.insert(0, "/root/repo")
from hexspark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("verify2", master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

# 1. full ER pipeline through the Runner (resumable surface) on the WIDE path
import tempfile
from hexspark import fixtures
from hexspark.pipeline import evaluate
from hexspark.pipeline.runner import PipelineConfig, Runner
tr = fixtures.transcripts_df(spark, n_base=400, seed=42, mutation_rate=0.01)
wd = tempfile.mkdtemp(prefix="verify_runner_")
r = Runner(spark, wd, PipelineConfig(max_dist=40, wide_pairs=True))
res = r.run(tr)
labels = fixtures.labeled_pairs_df(spark, tr)
pairs_cols = res.tables["candidate_pairs"].columns
m = evaluate.pairwise_f1(labels, res.tables["clusters"],
                         candidate_pairs=res.tables["candidate_pairs"].select("conv_id_a", "conv_id_b"))
print(f"[runner-wide] stages_run={res.stages_run} pairs_schema_has_chunks={'c0_a' in pairs_cols} f1={m['f1']:.4f}")
assert m["f1"] >= 0.99, m
# resume probe: second run must skip all stages
r2 = Runner(spark, wd, PipelineConfig(max_dist=40, wide_pairs=True))
res2 = r2.run(tr)
print(f"[resume] stages_skipped={res2.stages_skipped} stages_run={res2.stages_run}")
assert res2.stages_run == []

# 2. wide_block_scores via driver contract vs its DuckDB oracle, directly
import __spark_entry__ as E
import duckdb, os
sf = "/root/testdata/sf0.01"
sdf = E.queries()["wide_block_scores"](spark, sf).orderBy("doc_id_a", "doc_id_b")
srows = [(r.doc_id_a, r.doc_id_b, r.hamming_dist) for r in sdf.collect()]
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
orows = con.execute(E.oracle_sql()["wide_block_scores"] + " ORDER BY doc_id_a, doc_id_b").fetchall()
print(f"[oracle] spark={len(srows)} duckdb={len(orows)} equal={srows == [(a, b, int(h)) for a, b, h in orows]}")
assert srows == [(a, b, int(h)) for a, b, h in orows]

# 3. probe: JW kernel env override + weird strings through the scoring surface
import os
from hexspark import columns as C
import pyarrow as pa
probe_a = pa.array(["", "x", "   spaces   ", "ab"*24])
probe_b = pa.array(["", "", "   spaces   ", "ba"*24])
C._JW_IMPL = "duckdb"; jd = C.jw_arrow(probe_a, probe_b)
C._JW_IMPL = "numpy";  jn = C.jw_arrow(probe_a, probe_b)
C._JW_IMPL = None
import numpy as np
print(f"[jw-probe] duckdb={np.round(jd,4).tolist()} numpy={np.round(jn,4).tolist()} agree={np.allclose(jd, jn)}")

# 4. probe: HEXSPARK_JW_IMPL env forcing numpy, through score_wide on real pairs
os.environ["HEXSPARK_JW_IMPL"] = "numpy"
from hexspark.pipeline import assemble, blocking, scoring
from hexspark.pipeline import simhash as sm
sigs = sm.signatures(assemble.assemble_conversations(tr)).persist()
pw, _ = blocking.candidate_pairs_wide(sigs)
n_np = scoring.score_wide(pw, max_dist=40).count()
del os.environ["HEXSPARK_JW_IMPL"]
pw2, _ = blocking.candidate_pairs_wide(sigs)
n_duck = scoring.score_wide(pw2, max_dist=40).count()
print(f"[env-probe] edges numpy-impl={n_np} duckdb-impl={n_duck} equal={n_np == n_duck}")
assert n_np == n_duck
spark.stop()
print("DRIVE2_COMPLETE")
