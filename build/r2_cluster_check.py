"""Quick standalone-cluster check of the shuffle-writer fix: pipeline
stage walls at 8 vs 32 cores, small bulk. Reuses scaling_run machinery."""
import json
import sys

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from scaling_run import StandaloneCluster, build_zip, run_level

zpath = build_zip()
with StandaloneCluster() as cluster:
    r8 = run_level(cluster.url, 8, zpath, 12000, 100_000_000, 1, tag="chk")
    r32 = run_level(cluster.url, 32, zpath, 12000, 100_000_000, 1, tag="chk")
print(json.dumps({"t8": r8["timings"], "t32": r32["timings"],
                  "p8": r8["pipeline_convs_per_sec"], "p32": r32["pipeline_convs_per_sec"]}, indent=1))
