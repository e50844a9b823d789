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
import subprocess
jpid = None
for line in subprocess.run(["ps", "-eo", "pid,comm"], capture_output=True, text=True).stdout.splitlines():
    if line.strip().endswith(" java") or line.strip().split()[-1] == "java":
        jpid = int(line.split()[0])

def jvm_times():
    with open(f"/proc/{jpid}/stat") as f:
        fields = f.read().rsplit(') ', 1)[1].split()
    return int(fields[11])/100, int(fields[12])/100  # utime, stime

def sys_times():
    with open("/proc/stat") as f:
        p = f.readline().split()
    return int(p[1])/100, int(p[3])/100  # user, system

tr = fixtures.transcripts_df(spark, n_base=12000, seed=42, mutation_rate=0.01, partitions=64).persist()
tr.count()
sigs = sm.signatures(assemble.assemble_conversations(tr))
q = sigs.agg(F.sum(F.length("sig_hex") + F.col("n_chars")))
q.collect()  # warm (reuses shuffle)
u0, s0 = jvm_times(); U0, S0 = sys_times(); t0 = time.monotonic()
for i in range(3):
    q.collect()
dt = time.monotonic()-t0
u1, s1 = jvm_times(); U1, S1 = sys_times()
print(f"cpus={CPUS} 3x warm sigs: wall={dt:.1f}s jvm_user={u1-u0:.0f}s jvm_sys={s1-s0:.0f}s mach_user={U1-U0:.0f}s mach_sys={S1-S0:.0f}s", flush=True)
spark.stop()
