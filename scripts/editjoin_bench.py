"""PassJoin evidence bench: the segment-blocked edit-distance join on BOTH
of its envelopes, vs a length-banded brute-force control carrying the same
threshold-levenshtein verification.

* varied corpus (documents.text 40-char prefixes) — the workload PassJoin
  is FOR: segment keys are discriminating, the candidate stream collapses,
  brute force pays the full quadratic.
* uniform-format corpus (customer names, constant except trailing digits)
  — the documented degenerate envelope: every segment key outside the
  digit tail is corpus-wide hot, so the candidate stream approaches n^2
  and brute force's simpler plan wins. The bench REPORTS this instead of
  hiding it — on key-structured fixed-width corpora the repo's positional
  hamming family (kernels/scoring) is the right tool, not edit distance.

Both cases cross-check exactness (passjoin == brute on the shared corpus).
Writes build/editjoin_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from hexspark.ops.editjoin import passjoin_pairs
from hexspark.session import get_spark


def _brute(strings, tau):
    a = strings.select(F.col("rid").alias("id_a"), F.col("txt").alias("ta"))
    b = strings.select(F.col("rid").alias("id_b"), F.col("txt").alias("tb"))
    return (
        a.join(b, (a.id_a < b.id_b) & (F.abs(F.length("ta") - F.length("tb")) <= tau))
        .select("id_a", "id_b", F.expr(f"levenshtein(ta, tb, {tau})").alias("dist"))
        .where(F.col("dist") != -1)
    )


def _case(name, strings, tau):
    strings = strings.persist()
    n = strings.count()
    t0 = time.time()
    pj = passjoin_pairs(strings, "rid", "txt", tau).persist()
    pj_pairs = pj.count()
    pj_sec = time.time() - t0
    t0 = time.time()
    br = _brute(strings, tau).persist()
    br_pairs = br.count()
    br_sec = time.time() - t0
    equal = pj.exceptAll(br).isEmpty() and br.exceptAll(pj).isEmpty()
    pj.unpersist(), br.unpersist(), strings.unpersist()
    return {
        "case": name,
        "n_strings": n,
        "tau": tau,
        "passjoin_sec": round(pj_sec, 3),
        "brute_sec": round(br_sec, 3),
        "pairs": pj_pairs,
        "brute_pairs": br_pairs,
        "exact_match": bool(equal),
        "speedup_vs_brute": round(br_sec / pj_sec, 2) if pj_sec > 0 else None,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "editjoin-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    varied = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("rid"),
        F.lower(F.substring("text", 1, 40)).alias("txt"),
    )
    uniform = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_custkey") <= 2000)
        .select(F.col("c_custkey").alias("rid"), F.col("c_name").alias("txt"))
    )
    out = {
        "varied_text": _case("documents 40-char prefixes", varied, 2),
        "uniform_format_adversarial": _case("customer names (boilerplate-hot)", uniform, 2),
        "note": (
            "PassJoin wins when segment keys discriminate (varied text); on "
            "uniform-format keys every non-digit segment is corpus-hot and "
            "the candidate stream degenerates toward n^2 — use the "
            "positional hamming family for fixed-width key corpora."
        ),
        "sf_dir": sf_dir,
        "cpus": int(cpus),
    }
    os.makedirs("build", exist_ok=True)
    with open("build/editjoin_bench.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
