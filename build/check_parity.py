import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hexspark import fixtures
from hexspark.pipeline import assemble
from hexspark.pipeline import simhash as sm

tr = fixtures.transcripts_df(spark, n_base=300, seed=42, mutation_rate=0.01)
convs = assemble.assemble_conversations(tr)
new = sm.signatures(convs)
# oracle: canon + n_chars computed the old JVM way
old = convs.select("conv_id",
    F.substring(F.regexp_replace(F.lower("doc_text"), "[^a-z0-9 ]", ""), 1, 48).alias("canon_jvm"),
    F.length("doc_text").cast("long").alias("n_chars_jvm"),
    "n_turns")
j = new.join(old, "conv_id")
bad = j.where((F.col("canon") != F.col("canon_jvm")) | (F.col("n_chars") != F.col("n_chars_jvm"))).count()
tot = j.count()
print(f"rows={tot} mismatches={bad}")
r = new.select(F.length("sig_hex").alias("hl"), F.length("sig").alias("sl")).agg(
    F.min("hl"), F.max("hl"), F.min("sl"), F.max("sl")).collect()[0]
print("hex/sig lens:", list(r))
# sig_hex must equal lower(hex(sig))
bad2 = new.where(F.col("sig_hex") != F.lower(F.hex("sig"))).count()
print("sig_hex mismatches:", bad2)
spark.stop()
