"""Bench the 10^9-vertex distributed-labels CC path next to the driver-DSU
path on the same kron state (VERDICT r2 item 3: an unbenchmarked scale path
is a claim, not evidence).

Fresh process per parallelism level (Spark master is fixed per JVM);
best-of-K timings after a warm-up; writes BENCH/distributed_cc_{cpus}.json
and prints one JSON line per level.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCALE = int(os.environ.get("SPARK_GRAFT_KRON_SCALE", "17"))
EF = int(os.environ.get("SPARK_GRAFT_KRON_EF", "256"))
RUNS = int(os.environ.get("SPARK_GRAFT_DCC_RUNS", "3"))
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_DCC_LEVELS", "8,32").split(",")]

WORKER = r"""
import time, sys, os, json
sys.path.insert(0, %(repo)r)
cpus = int(sys.argv[1]); scale = int(sys.argv[2]); ef = int(sys.argv[3]); runs = int(sys.argv[4])
from graphzeppelin_spark import get_spark
from graphzeppelin_spark.operators.sketch_cc import SketchCC
spark = get_spark(cores=cpus, shuffle_partitions=2 * cpus)
path = f"/tmp/gz_bench_kron_{scale}_{ef}.parquet"
if not os.path.exists(path):
    from graphzeppelin_spark.sources.generators import kron_stream
    pdf = kron_stream(scale=scale, edge_factor=ef, seed=42)
    spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(path)
stream = spark.read.parquet(path)
n_upd = stream.count()
alg = SketchCC(spark, num_vertices=1 << scale, seed=42, samples_factor=0.5,
               num_partitions=128)
from graphzeppelin_spark.session import aqe_off
with aqe_off(spark):
    state = alg.build_state(stream).persist()
    state.count()
t_dist, t_dsu, n_comp = [], [], None
for _ in range(runs):
    t0 = time.time()
    out = alg.connected_components_distributed(state)
    n_comp = out.select("component").distinct().count()
    t_dist.append(time.time() - t0)
for _ in range(runs):
    t0 = time.time()
    labels, forest = alg.boruvka(state)
    t_dsu.append(time.time() - t0)
import numpy as np
n_comp_dsu = int(len(np.unique(labels)))
print("RESULT " + json.dumps({
    "cpus": cpus, "n_updates": n_upd,
    "distributed_times": [round(t, 2) for t in t_dist],
    "distributed_best_sec": round(min(t_dist), 2),
    "driver_dsu_times": [round(t, 2) for t in t_dsu],
    "driver_dsu_best_sec": round(min(t_dsu), 2),
    "n_components_distributed_nonisolated": n_comp,
    "n_components_driver_dsu_total": n_comp_dsu,
}))
"""


def main() -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, "-c", WORKER % {"repo": REPO},
             str(cpus), str(SCALE), str(EF), str(RUNS)],
            capture_output=True, text=True, timeout=3600,
        )
        res = None
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[len("RESULT "):])
        if res is None:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"no RESULT from cpus={cpus}")
        res["workload"] = f"kron_{SCALE} sketch CC, edge_factor={EF}"
        print(json.dumps(res))
        with open(os.path.join(REPO, "BENCH", f"distributed_cc_{cpus}.json"), "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
