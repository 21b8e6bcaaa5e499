"""Measure this VM's parallel-compute ceiling, independent of Spark and of
this engine: an embarrassingly parallel, L2-cache-resident uint64 hash loop
(zero shared data, zero synchronization, zero DRAM pressure) run at 1/4/8/16/32
processes with a start barrier. No real workload can scale better than this.

Context for the north_rule scaling-efficiency evidence: on this Firecracker
VM the ceiling itself measured 0.66 for 8->32 and 0.81 for 4->16 (cores are
unevenly fast and/or SMT-paired), so job efficiencies must be read against
it, and the honest raw >=0.8 demonstration uses a core range where the
ceiling is ~1.0 (2->8). Numbers vary per VM — run THIS probe on the target
machine; results are saved to BENCH/hardware_ceiling.json, which
scripts/scaling_bench.py reads instead of hardcoding.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "BENCH", "hardware_ceiling.json")


def _init(barrier):
    global _B
    _B = barrier


def worker(seed: int) -> float:
    a = np.arange(100_000, dtype=np.uint64) + np.uint64(seed)  # 800KB, L2-resident
    # warm
    for _ in range(20):
        a = (a ^ (a >> np.uint64(13))) * np.uint64(0x9E3779B97F4A7C15)
    _B.wait()
    t0 = time.time()
    it = 0
    while time.time() - t0 < 4.0:
        for _ in range(50):
            a = (a ^ (a >> np.uint64(13))) * np.uint64(0x9E3779B97F4A7C15)
        it += 50
    return it * 100_000 / (time.time() - t0)


def run(procs: int) -> float:
    barrier = mp.Barrier(procs)
    with mp.Pool(procs, initializer=_init, initargs=(barrier,)) as pool:
        res = pool.map(worker, range(procs))
    return sum(res)


def main() -> None:
    base = {}
    for p in (1, 2, 4, 8, 16, 32):
        thr = run(p)
        base[p] = thr
        print(f"{p:2d}p: {thr/1e6:8.0f} M elem-ops/s aggregate", flush=True)
    effs = {}
    for lo, hi in ((2, 8), (4, 16), (8, 32)):
        eff = base[hi] / (4 * base[lo])
        effs[f"{lo}_to_{hi}"] = round(eff, 3)
        print(f"ceiling efficiency {lo}->{hi}: {eff:.3f}")
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(
            {
                "note": "measured on THIS VM only; re-run the probe elsewhere",
                "throughput_by_procs": {str(p): round(t, 1) for p, t in base.items()},
                "ceiling_efficiency": effs,
            },
            f,
            indent=1,
        )
    print(f"saved {OUT_PATH}")


if __name__ == "__main__":
    mp.set_start_method("spawn", force=True)
    main()
