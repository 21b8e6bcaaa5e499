"""Scaling-efficiency evidence (north_rule: throughput efficiency >= 0.8 from
N to 4N parallelism, measured here as local[8] vs local[32] on the same input
— this sandbox has no multi-machine cluster).

Runs the kron insert+delete ingest at both parallelism levels in fresh
processes (Spark master is fixed per JVM), min-of-K timed runs per level to
damp the sandbox VM's noisy timing (observed 4x run-to-run swings at idle).

Writes/updates BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCALE = int(os.environ.get("SPARK_GRAFT_KRON_SCALE", "17"))
EF = int(os.environ.get("SPARK_GRAFT_KRON_EF", "256"))
RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
# pairs of (N, 4N) parallelism levels; semicolon-separated
LEVELS = [
    tuple(int(x) for x in pair.split(","))
    for pair in os.environ.get(
        "SPARK_GRAFT_SCALE_LEVELS", "2,8;4,16;8,32"
    ).split(";")
]

WORKER = r"""
import time, sys, os
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
n = stream.count()
# identical job at both levels: fixed partition count (so the work units are
# the same size and Spark's scheduler can load-balance this VM's unevenly
# fast cores), same sketch config as bench.py's headline
alg = SketchCC(spark, num_vertices=1 << scale, seed=42, samples_factor=0.5,
               num_partitions=128)
from graphzeppelin_spark.session import aqe_off
times = []
with aqe_off(spark):
    alg.build_state(stream).count()  # warm workers, scratch, page cache
    for _ in range(runs):
        t0 = time.time(); alg.build_state(stream).count(); times.append(time.time() - t0)
import json
print("RESULT " + json.dumps({"cpus": cpus, "n_updates": n, "times": times,
                              "best_sec": min(times)}))
"""


def run_level(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO},
         str(cpus), str(SCALE), str(EF), str(RUNS)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(out.stdout[-2000:], file=sys.stderr)
    print(out.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"no RESULT from cpus={cpus}")


def _load_ceilings() -> tuple[dict[tuple[int, int], float], str]:
    """Hardware context: what a PERFECT embarrassingly-parallel,
    cache-resident workload scores on this VM for the same core pair (no real
    job can beat it). Read from the probe's saved measurement
    (BENCH/hardware_ceiling.json, written by hardware_ceiling_probe.py);
    absent that, fall back to the values measured on the original build VM —
    marked as such in the emitted JSON since they are meaningless elsewhere.
    """
    path = os.path.join(REPO, "BENCH", "hardware_ceiling.json")
    if os.path.exists(path):
        with open(path) as f:
            effs = json.load(f)["ceiling_efficiency"]
        return {
            tuple(int(x) for x in k.split("_to_")): v for k, v in effs.items()
        }, "measured_by_probe_on_this_vm"
    return {(2, 8): 1.0, (4, 16): 0.81, (8, 32): 0.66}, "original_build_vm_only"


def main() -> None:
    ceilings, ceiling_provenance = _load_ceilings()
    results = {}
    for cpus in sorted({c for pair in LEVELS for c in pair}):
        results[cpus] = run_level(cpus)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    import statistics

    for lo, hi in LEVELS:
        r_lo, r_hi = results[lo], results[hi]
        thr_lo = r_lo["n_updates"] / r_lo["best_sec"]
        thr_hi = r_hi["n_updates"] / r_hi["best_sec"]
        eff = thr_hi / ((hi / lo) * thr_lo)
        # variance story (VERDICT r4 item 5): the single best-vs-best ratio
        # sits on a noisy VM — publish per-level spread plus the efficiency
        # band over ALL run pairings, and a median-vs-median point estimate
        eff_all = sorted(
            (r_lo["n_updates"] / th) / ((hi / lo) * (r_lo["n_updates"] / tl))
            for tl in r_lo["times"]
            for th in r_hi["times"]
        )
        eff_median = (
            (r_lo["n_updates"] / statistics.median(r_hi["times"]))
            / ((hi / lo) * (r_lo["n_updates"] / statistics.median(r_lo["times"])))
        )

        def _spread(times):
            return {
                "mean_sec": round(statistics.mean(times), 2),
                "median_sec": round(statistics.median(times), 2),
                "stdev_sec": round(
                    statistics.stdev(times) if len(times) > 1 else 0.0, 2
                ),
            }

        summary = {
            "workload": f"kron_{SCALE} insert+delete stream, edge_factor={EF}",
            "n_updates": r_lo["n_updates"],
            f"local{lo}": {"best_sec": round(r_lo["best_sec"], 2),
                           "updates_per_sec": round(thr_lo, 1),
                           "times": [round(t, 2) for t in r_lo["times"]],
                           **_spread(r_lo["times"])},
            f"local{hi}": {"best_sec": round(r_hi["best_sec"], 2),
                           "updates_per_sec": round(thr_hi, 1),
                           "times": [round(t, 2) for t in r_hi["times"]],
                           **_spread(r_hi["times"])},
            f"scaling_efficiency_{lo}_to_{hi}": round(eff, 3),
            "scaling_efficiency_median": round(eff_median, 3),
            "scaling_efficiency_band_all_pairings": [
                round(eff_all[0], 3), round(eff_all[-1], 3)
            ],
            "runs_per_level": len(r_lo["times"]),
        }
        ceil = ceilings.get((lo, hi))
        if ceil:
            summary["hardware_ceiling_efficiency"] = ceil
            summary["hardware_ceiling_provenance"] = ceiling_provenance
            summary["efficiency_normalized_to_ceiling"] = round(eff / ceil, 3)
        print(json.dumps(summary))
        with open(os.path.join(REPO, "BENCH", f"scaling_{lo}_{hi}.json"), "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
