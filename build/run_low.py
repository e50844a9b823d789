import json
import sys

sys.path.insert(0, "/root/repo/scripts")
import scaling_run as SR

zpath = SR.build_zip()
with SR.StandaloneCluster() as cluster:
    rl2 = SR.run_level(cluster.url, 2, zpath, 12000, 600000000, 2,
                       executor_cores=2, skip_pipeline=True, tag="low")
    rl8 = SR.run_level(cluster.url, 8, zpath, 12000, 600000000, 2,
                       executor_cores=2, skip_pipeline=True, tag="low")
eff = rl8["bulk_pairs_per_sec"] / (4 * rl2["bulk_pairs_per_sec"])
print(json.dumps({"low2": rl2["bulk_pairs_per_sec"],
                  "low8": rl8["bulk_pairs_per_sec"], "eff_low": eff}))
