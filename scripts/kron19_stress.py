"""kron_19 end-to-end stress — the 10x-scale checkpoint for the 100x design
claims (VERDICT r3 item 5): 2^19 vertices, ~128M insert+delete updates
through the full pipeline (ingest → sketch CC → PageRank) at local[32].

What this verifies beyond kron_17:
- the ingest path's two-exchange plan and the sparse row format hold when
  state rows are ~4x wider (bkt_per_col grows with log n^2) and the stream
  is 4x longer;
- boruvka()'s driver-finish byte gate stays inside driver_finish_bytes
  (collect is per-ACTIVE-component, not per-vertex) and the label broadcast
  (one int64 pair per state vertex) stays megabytes;
- PageRank's per-iteration plan (algebraic contribution shuffle + scalar
  convergence collect) sustains ~85M directed edges x N iterations.

Records wall times + peak RSS of the driver python process and the Spark
JVM (VmHWM) in BENCH/kron19.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(os.environ.get("SPARK_GRAFT_K19_SCALE", "19"))
EF = int(os.environ.get("SPARK_GRAFT_K19_EF", "256"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PR_ITERS = int(os.environ.get("SPARK_GRAFT_K19_PR_ITERS", "10"))


def _vm_hwm_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return -1


def _jvm_pid() -> int | None:
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() == "java":
                    return int(pid)
        except OSError:
            continue
    return None


def main() -> None:
    import numpy as np

    from graphzeppelin_spark import get_spark
    from graphzeppelin_spark.operators.sketch_cc import SketchCC
    from graphzeppelin_spark.session import aqe_off

    t_all = time.time()
    spark = get_spark(app_name="gz_kron19", cores=CPUS, shuffle_partitions=2 * CPUS)
    n = 1 << SCALE
    cache = f"/tmp/gz_bench_kron_{SCALE}_{EF}.parquet"
    if not os.path.exists(cache):
        # distributed generation: the driver-side kron_stream at scale 19 is
        # ~20 min single-core and ~28 GB driver RSS on this VM; the
        # mapInPandas generator parallelizes across every core and the
        # driver never holds the stream (same RMAT distribution, different
        # rng consumption order — n_updates differs slightly from the
        # driver-side form)
        from graphzeppelin_spark.sources.generators import kron_stream_distributed

        t0 = time.time()
        stream_gen = kron_stream_distributed(spark, scale=SCALE, edge_factor=EF, seed=42)
        stream_gen.repartition(4 * CPUS).write.mode("overwrite").parquet(cache)
        print(f"generated (distributed) in {time.time() - t0:.0f}s", file=sys.stderr)
    stream = spark.read.parquet(cache)
    n_updates = stream.count()

    alg = SketchCC(spark, num_vertices=n, seed=42, samples_factor=0.5, num_partitions=128)
    out: dict = {"scale": SCALE, "edge_factor": EF, "n_updates": int(n_updates), "cpus": CPUS}

    # ---- ingest (warm-up + best-of-2) -----------------------------------
    with aqe_off(spark):
        alg.build_state(stream).count()  # warm-up, untimed
        runs, state = [], None
        for _ in range(2):
            if state is not None:
                state.unpersist()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            state = alg.build_state(stream).persist()
            state.count()
            runs.append(time.time() - t0)
    out["ingest_runs_sec"] = [round(r, 2) for r in runs]
    out["ingest_sec"] = round(min(runs), 2)
    out["updates_per_sec"] = round(n_updates / min(runs), 1)
    print(f"ingest: {out['ingest_sec']}s = {out['updates_per_sec']/1e6:.2f}M upd/s",
          file=sys.stderr)

    # ---- sketch CC (driver-DSU fast path, gate instrumented) ------------
    cc_runs = []
    labels = None
    for _ in range(2):
        t0 = time.time()
        labels, forest = alg.boruvka(state)
        cc_runs.append(time.time() - t0)
    out["cc_runs_sec"] = [round(r, 2) for r in cc_runs]
    out["cc_sec"] = round(min(cc_runs), 2)
    out["n_components"] = int(len(np.unique(labels)))
    out["forest_edges"] = int(len(forest))
    # gate evidence: the boruvka driver collect is bounded by active
    # components x remaining slice bytes (<= driver_finish_bytes), never n
    g = alg.geom
    out["slice_bytes_per_group"] = (g.cols_per_sample * g.bkt_per_col + 1) * 16
    out["num_samples"] = g.num_samples
    print(f"sketch CC: {out['cc_sec']}s, {out['n_components']} components",
          file=sys.stderr)

    # ---- distributed-labels CC (the 10^9 path at 10x) -------------------
    # NO System.gc() needed anymore: the round-4 "370s late-session" number
    # was boruvka() dropping the caller's state cache (every query after the
    # first silently re-ran the sketch build) — fixed in round 5; see
    # scripts/late_session_stress.py for the dedicated no-GC evidence run
    t0 = time.time()
    dcc = alg.connected_components_distributed(state)
    out["distributed_cc_nonisolated_components"] = int(
        dcc.select("component").distinct().count()
    )
    out["distributed_cc_sec"] = round(time.time() - t0, 2)
    print(f"distributed CC: {out['distributed_cc_sec']}s", file=sys.stderr)

    # ---- PageRank over the live edge set --------------------------------
    from pyspark.sql import functions as F

    from graphzeppelin_spark.operators.pagerank import pagerank_df

    live = (
        stream.groupBy("src", "dst")
        .agg(F.count("*").alias("c"))
        .groupBy(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .agg(F.sum("c").alias("c"))
        .where(F.col("c") % 2 == 1)
        .select("src", "dst")
        .persist()
    )
    out["live_edges"] = int(live.count())
    verts = spark.range(n).selectExpr("id as v")
    t0 = time.time()
    pr = pagerank_df(live, vertices=verts, num_iters=PR_ITERS)
    s = pr.agg(F.sum("score")).collect()[0][0]
    out["pagerank_iters"] = PR_ITERS
    out["pagerank_sec"] = round(time.time() - t0, 2)
    out["pagerank_score_sum"] = round(float(s), 6)  # ~1.0 sanity
    print(f"pagerank x{PR_ITERS}: {out['pagerank_sec']}s (sum {s:.6f})", file=sys.stderr)

    out["wall_total_sec"] = round(time.time() - t_all, 1)
    out["driver_peak_rss_mb"] = _vm_hwm_kb(os.getpid()) // 1024
    jp = _jvm_pid()
    out["jvm_peak_rss_mb"] = (_vm_hwm_kb(jp) // 1024) if jp else -1
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
    with open(os.path.join(bench_dir, "kron19.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
