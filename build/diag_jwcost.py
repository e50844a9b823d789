import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1])
import os
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1<<30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1<<30))
spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo/scripts")
from scaling_job import synth_pair_stream
from hexspark.pipeline import scoring
N = 100_000_000

def timeit(name, mk, reps=2):
    mk(0).count()
    best = None
    for i in range(1, reps+1):
        t0 = time.monotonic(); n = mk(i).count(); dt = time.monotonic()-t0
        best = dt if best is None or dt < best else best
    print(f"cpus={CPUS} {name}: {best:.2f}s = {N/best/1e6:.0f}M pairs/s (n={n})", flush=True)

# generation + JVM hamming only (gate excludes all dups: dist~32 > 20)
timeit("gen_jvm_only", lambda s: synth_pair_stream(spark, N, CPUS*4, s)
       .withColumn("hd", scoring.hamming_jvm()).where(F.col("hd") <= 20))
# full scoring incl JW on ~10%
timeit("full_score", lambda s: scoring.score_wide(synth_pair_stream(spark, N, CPUS*4, s), max_dist=60, min_score=0.5))
spark.stop()
