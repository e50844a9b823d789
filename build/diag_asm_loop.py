import sys, time
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
tr = fixtures.transcripts_df(spark, n_base=12000, seed=42, mutation_rate=0.01, partitions=64).persist()
tr.count()
print("LOOP_START", flush=True)
t0 = time.monotonic()
for i in range(6):
    # salt defeats shuffle reuse -> every iteration is a cold aggregation
    q = assemble.assemble_conversations(tr.withColumn("salt", F.lit(i)).drop("salt"))
    q.count()
print(f"LOOP_DONE {(time.monotonic()-t0)/6:.1f}s per cold assemble", flush=True)
time.sleep(1)
spark.stop()
