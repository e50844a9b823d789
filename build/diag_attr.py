import sys, time, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
CPUS = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS*2))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hexspark import fixtures
from hexspark.pipeline import assemble
from hexspark.pipeline import simhash as sm

def snap_all():
    d = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(') ', 1)
                comm = parts[0].split('(', 1)[1]
                fl = parts[1].split()
                d[pid] = (comm, int(fl[11]) + int(fl[12]))
        except Exception:
            pass
    return d

tr = fixtures.transcripts_df(spark, n_base=12000, seed=42, mutation_rate=0.01, partitions=64).persist()
tr.count()
sigs = sm.signatures(assemble.assemble_conversations(tr))
s1 = snap_all(); t0 = time.monotonic()
sigs.agg(F.sum(F.length("sig_hex") + F.col("n_chars"))).collect()
dt = time.monotonic()-t0
s2 = snap_all()
agg = {}
for pid, (comm, c2) in s2.items():
    c1 = s1.get(pid, (comm, 0))[1]
    delta = c2 - c1
    if delta > 0:
        agg[comm] = agg.get(comm, [0, 0])
        agg[comm][0] += delta; agg[comm][1] += 1
print(f"cpus={CPUS} cold sigs wall={dt:.1f}s")
for k, (v, n) in sorted(agg.items(), key=lambda x: -x[1][0])[:8]:
    print(f"  {v/100:.0f}s across {n} procs: {k}")
spark.stop()
