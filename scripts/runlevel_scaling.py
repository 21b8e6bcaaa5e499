"""Run-level interleaved N->4N scaling bench (round-6 verdict next-round #1).

The round-6 session-level record (BENCH/multiexec_1_4.json) measured per-pair
median 0.591 at 1->4 executors, with forensics pointing at a one-sided host
interference mode that ramps 1-exec sessions across a multi-minute sequence
while 4-exec stays flat. This script attacks the two untried levers the
verdict named:

(a) RUN-LEVEL interleaving: each efficiency ratio is formed from two
    ADJACENT ~1-2-minute sessions (scripts/runlevel_job.py: warm-up + one
    timed run, fresh JVMs), in ABBA order (lo,hi,hi,lo,lo,hi,hi,lo,...) so
    linear drift cancels inside every consecutive ratio pair as well as
    inside each ratio; >=8 ratios, median + full array published.

(b) optional CORE PINNING via taskset on the spark-submit child
    (SPARK_GRAFT_RL_PIN_LO / SPARK_GRAFT_RL_PIN_HI, e.g. "0-7"): the guest
    shows 32 single-thread cores (SMT topology invisible — Thread(s)/core=1
    in lscpu), so pinning fixes the vCPU set the scheduler may otherwise
    migrate across; if Firecracker pins vCPU->pCPU, a fixed guest set is a
    fixed host set, directly testing the SMT-sibling/LLC co-tenancy
    hypothesis.

Steal-gating: each run records its window's hypervisor steal%; a pair where
either run exceeds SPARK_GRAFT_RL_STEAL_GATE (default 3%) is flagged and the
clean-pair median is reported alongside the all-pair median.

Writes BENCH/$SPARK_GRAFT_RL_OUT (default runlevel_scaling.json).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE = int(os.environ.get("SPARK_GRAFT_RL_SCALE", "17"))
EF = int(os.environ.get("SPARK_GRAFT_RL_EF", "256"))
PAIRS = int(os.environ.get("SPARK_GRAFT_RL_PAIRS", "8"))
LO = int(os.environ.get("SPARK_GRAFT_RL_LO", "1"))
HI = int(os.environ.get("SPARK_GRAFT_RL_HI", "4"))
CORES_PER_EXEC = 4
MEM_MB = 12288
STEAL_GATE = float(os.environ.get("SPARK_GRAFT_RL_STEAL_GATE", "3.0"))

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
from multiexec_bench import build_pkg_zip  # noqa: E402


def ensure_stream() -> None:
    cache = f"/tmp/gz_bench_kron_{SCALE}_{EF}.parquet"
    if os.path.exists(cache):
        return
    from graphzeppelin_spark import get_spark
    from graphzeppelin_spark.sources.generators import kron_stream

    spark = get_spark(cores=16)
    pdf = kron_stream(scale=SCALE, edge_factor=EF, seed=42)
    spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(cache)
    spark.stop()


def run_session(n_exec: int, zip_path: str, pin: str | None) -> dict:
    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                                "spark-submit")
    cmd = [
        spark_submit,
        "--master", f"local-cluster[{n_exec},{CORES_PER_EXEC},{MEM_MB}]",
        "--driver-memory", "8g",
        "--conf", f"spark.executor.memory={MEM_MB - 2048}m",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "runlevel_job.py"),
        str(SCALE), str(EF), str(n_exec * CORES_PER_EXEC),
    ]
    if pin:
        # taskset affinity is inherited by the worker/executor JVM children
        cmd = ["taskset", "-c", pin] + cmd
    env = dict(os.environ)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=1800)
    m = re.search(r"^RESULT (\{.*\})$", p.stdout, re.M)
    if not m:
        sys.stderr.write(p.stdout[-3000:] + "\n" + p.stderr[-5000:] + "\n")
        raise RuntimeError(f"no RESULT line at {n_exec} executors")
    res = json.loads(m.group(1))
    res.update({"executors": n_exec, "pin": pin,
                "session_wall_sec": round(time.time() - t0, 1),
                "t_end": round(time.time(), 1)})
    print(json.dumps(res), file=sys.stderr)
    return res


def main() -> None:
    ensure_stream()
    zip_path = "/tmp/gz_pkg.zip"
    build_pkg_zip(zip_path)
    pin_lo = os.environ.get("SPARK_GRAFT_RL_PIN_LO") or None
    pin_hi = os.environ.get("SPARK_GRAFT_RL_PIN_HI") or None

    sessions: list[dict] = []
    # ABBA ordering: pair i runs (lo,hi) on even i and (hi,lo) on odd i, so
    # a linear drift component cancels across consecutive pairs too
    for i in range(PAIRS):
        order = [(LO, pin_lo), (HI, pin_hi)] if i % 2 == 0 else \
                [(HI, pin_hi), (LO, pin_lo)]
        for n_exec, pin in order:
            s = run_session(n_exec, zip_path, pin)
            s["pair"] = i
            sessions.append(s)

    scale_up = HI / LO
    pairs = []
    for i in range(PAIRS):
        lo_s = next(s for s in sessions if s["pair"] == i and s["executors"] == LO)
        hi_s = next(s for s in sessions if s["pair"] == i and s["executors"] == HI)
        eff = round(lo_s["ingest_sec"] / (scale_up * hi_s["ingest_sec"]), 3)
        pairs.append({
            "pair": i,
            "eff": eff,
            "lo_sec": lo_s["ingest_sec"], "hi_sec": hi_s["ingest_sec"],
            "lo_steal_pct": lo_s["ingest_steal_pct"],
            "hi_steal_pct": hi_s["ingest_steal_pct"],
            "clean": (lo_s["ingest_steal_pct"] <= STEAL_GATE
                      and hi_s["ingest_steal_pct"] <= STEAL_GATE),
        })

    def med(xs: list[float]) -> float | None:
        if not xs:
            return None
        xs = sorted(xs)
        return round(xs[len(xs) // 2], 3)

    all_effs = [p["eff"] for p in pairs]
    clean_effs = [p["eff"] for p in pairs if p["clean"]]
    out = {
        "workload": f"kron_{SCALE} ef={EF} ingest, runlevel-interleaved "
                    f"{LO}->{HI} executors x {CORES_PER_EXEC} cores, ABBA "
                    "order, fresh JVM per session, one timed run each",
        "pairs": pairs,
        "sessions": sessions,
        "eff_median_all_pairs": med(all_effs),
        "eff_median_clean_pairs": med(clean_effs),
        "n_clean_pairs": len(clean_effs),
        "steal_gate_pct": STEAL_GATE,
        "pin_lo": pin_lo, "pin_hi": pin_hi,
        "hardware_ceiling_note": "ideal-workload ceiling on this VM: 4->16 "
        "cores 0.81 (BENCH/hardware_ceiling.json); ceiling-normalized = "
        "raw / 0.81 for the 1->4-executor (4->16 core) pair",
    }
    if out["eff_median_all_pairs"]:
        out["ceiling_normalized_median_all"] = round(
            out["eff_median_all_pairs"] / 0.81, 3)
    out_name = os.environ.get("SPARK_GRAFT_RL_OUT", "runlevel_scaling.json")
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "sessions"}))


if __name__ == "__main__":
    main()
