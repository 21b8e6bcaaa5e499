"""Benchmark harness (driver contract: prints ONE JSON line on stdout).

Times the headline contract queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
and the kron-style insert+delete stream ingest (the BASELINE.json metric:
sustained edge-updates/sec into the sketch state, plus CC convergence time).

Headline value = sustained edge-updates/sec on the kron stream.

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
KRON_CACHE = f"/tmp/gz_bench_kron_{KRON_SCALE}_{KRON_EDGE_FACTOR}.parquet"

# cheap relational queries first: they double as the session warm-up (JVM
# codegen, python workers, parquet footers) so the heavy graph queries are
# measured, not the cold start
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

    qs = entrymod.queries()
    times: dict[str, float] = {}
    only_kron = os.environ.get("SPARK_GRAFT_ONLY_KRON") == "1"
    for name in [] if only_kron else BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        log(f"{name}: {times[name]}s ({n} rows)")

    # ---- kron insert+delete stream ingest (the headline metric) ----------
    n_vertices = 1 << KRON_SCALE
    if not os.path.exists(KRON_CACHE):
        from graphzeppelin_spark.sources.generators import kron_stream

        pdf = kron_stream(scale=KRON_SCALE, edge_factor=KRON_EDGE_FACTOR, seed=42)
        spark.createDataFrame(pdf).repartition(max(2 * cpus, 16)).write.mode(
            "overwrite"
        ).parquet(KRON_CACHE)
    stream = spark.read.parquet(KRON_CACHE)
    n_updates = stream.count()

    from graphzeppelin_spark.operators.sketch_cc import SketchCC

    alg = SketchCC(
        spark,
        num_vertices=n_vertices,
        seed=42,
        samples_factor=0.5,
        num_partitions=max(2 * cpus, 16),
    )
    # untimed warm-up: spawns python workers, faults in per-worker scratch,
    # warms the parquet scan — we report sustained steady-state throughput,
    # like the reference's looped benchmarks; best-of-2 to damp box noise
    from graphzeppelin_spark.session import aqe_off

    spark.catalog.clearCache()
    runs = []
    state = None
    with aqe_off(spark):  # ingest shuffles are few/large/fixed-width
        warm = alg.build_state(stream)  # full width: every worker + partition warmed
        warm.count()
        for i in range(2):
            if state is not None:
                state.unpersist()
            t0 = time.time()
            state = alg.build_state(stream).persist()
            state.count()
            runs.append(time.time() - t0)
    ingest_s = min(runs)
    upd_per_sec = n_updates / ingest_s
    log(f"kron_{KRON_SCALE} ingest: {n_updates} updates in {ingest_s:.2f}s "
        f"= {upd_per_sec/1e6:.3f} M upd/s on local[{cpus}]")
    times["kron_ingest"] = round(ingest_s, 3)

    t0 = time.time()
    labels, _ = alg.boruvka(state)
    cc_s = time.time() - t0
    import numpy as np

    log(f"kron_{KRON_SCALE} sketch CC: {cc_s:.2f}s, "
        f"{len(np.unique(labels))} components")
    times["kron_sketch_cc"] = round(cc_s, 3)
    state.unpersist()

    out = {
        "metric": "kron_stream_updates_per_sec",
        "value": round(upd_per_sec, 1),
        "unit": "updates/sec",
        "queries": times,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "kron": {
            "scale": KRON_SCALE,
            "edge_factor": KRON_EDGE_FACTOR,
            "n_updates": int(n_updates),
            "ingest_sec": round(ingest_s, 3),
            "cc_sec": round(cc_s, 3),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
