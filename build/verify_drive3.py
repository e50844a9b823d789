import sys
sys.path.insert(0, "/root/repo")
from hexspark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("verify3", master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
import duckdb, time

# 1. drive the changed query through the driver contract vs its oracle
sf = "/root/testdata/sf0.01"
t0 = time.monotonic()
sdf = E.queries()["minhash_pairs"](spark, sf).orderBy("id_a", "id_b")
srows = [(r.id_a, r.id_b, r.n_shared, round(r.est_jaccard, 6)) for r in sdf.collect()]
t_spark = time.monotonic() - t0
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
orows = [(a, b, int(n), round(j, 6)) for a, b, n, j in
         con.execute(E.oracle_sql()["minhash_pairs"] + " ORDER BY id_a, id_b").fetchall()]
print(f"[contract] spark={len(srows)} rows in {t_spark:.1f}s, duckdb={len(orows)}, equal={srows == orows}")
print(f"[contract] sample: {srows[:3]}")
assert srows == orows

# 2. probes: short/empty/degenerate docs through minhash_pairs + shingles
from hexspark.ops.dedup import minhash_pairs, shingles
probe = spark.createDataFrame(
    [(1, "only two"), (2, "only two"), (3, ""), (4, "one"), (5, "a b c d e"),
     (6, "a b c d e"), (7, "x " * 200)],
    "doc_id long, text string")
out = minhash_pairs(probe, k=8, band_rows=4).orderBy("id_a", "id_b").collect()
print("[probe] pairs on degenerate docs:", [(r.id_a, r.id_b, r.n_shared, round(r.est_jaccard, 3)) for r in out])
sh = probe.select("doc_id", F.size(shingles(F.col("text"))).alias("n_sh")).orderBy("doc_id").collect()
print("[probe] shingle counts:", [(r.doc_id, r.n_sh) for r in sh])
# identical docs must collide on ALL bands
d = {(r.id_a, r.id_b): r.n_shared for r in out}
assert d.get((1, 2)) == 2 and d.get((5, 6)) == 2, d
# empty doc shares nothing with anything
assert not any(3 in p for p in d), d

# 3. probe: band_rows validation
try:
    minhash_pairs(probe, k=8, band_rows=3).count()
    print("[probe] band_rows=3: NO ERROR (unexpected)")
except AssertionError as e:
    print(f"[probe] band_rows=3 -> AssertionError: {e}")
spark.stop()
print("DRIVE3_COMPLETE")
