"""Standalone-cluster 32-core run with event logs for diagnosis."""
import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo/scripts")
from scaling_run import StandaloneCluster, build_zip, spark_bin

REPO = "/root/repo"
cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
evdir = f"/tmp/r2-ev-cluster{cores}"
os.makedirs(evdir, exist_ok=True)
zpath = build_zip()
out_json = f"/tmp/r2_cluster{cores}.json"
with StandaloneCluster() as cluster:
    cmd = [
        spark_bin("spark-submit"),
        "--master", cluster.url,
        "--driver-memory", "8g",
        "--py-files", zpath,
        "--conf", f"spark.cores.max={cores}",
        "--conf", "spark.executor.cores=8",
        "--conf", "spark.executor.memory=10g",
        "--conf", f"spark.executorEnv.MALLOC_MMAP_THRESHOLD_={1 << 30}",
        "--conf", f"spark.executorEnv.MALLOC_TRIM_THRESHOLD_={1 << 30}",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.eventLog.enabled=true",
        "--conf", f"spark.eventLog.dir={evdir}",
        "--conf", "spark.eventLog.compress=false",
        os.path.join(REPO, "scripts", "scaling_job.py"),
        "--cpus", str(cores),
        "--n-base", "12000",
        "--pairs-target", "100000000",
        "--reps", "1",
        "--out", out_json,
    ]
    subprocess.run(cmd, check=True, cwd=REPO,
                   stdout=open(f"/tmp/r2-cluster-submit-{cores}.log", "w"),
                   stderr=subprocess.STDOUT)
print(open(out_json).read())
