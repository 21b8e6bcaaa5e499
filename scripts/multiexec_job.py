"""spark-submit job for the multi-executor fidelity bench (north_rule:
`spark-submit --py-files` at N and 4N executors).

Run BY spark-submit with --master local-cluster[n,cores,mem] — real worker
+ executor JVM processes, real closure serialization, broadcasts actually
shipped over the wire, python workers spawned per-executor — none of which
a single-JVM local[N] exercises. The session deliberately does NOT use
graphzeppelin_spark.get_spark (which pins a local[N] master); it inherits
spark-submit's master and mirrors session.py's tuning knobs.

argv: scale edge_factor runs total_cores. Prints one `RESULT {...}` JSON
line: ingest best-of-K, driver-DSU CC, distributed CC, pagerank x5.
(total_cores is passed explicitly because sc.defaultParallelism lies until
the cluster's executors have registered.)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    scale, ef, runs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    total_cores = int(sys.argv[4])
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("gz_multiexec").getOrCreate()
    sc = spark.sparkContext
    for k, v in {
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    }.items():
        spark.conf.set(k, v)
    sc.setLogLevel("WARN")

    import numpy as np

    from graphzeppelin_spark.hostmeter import StealMeter

    try:  # triad probe added mid-round-6; tolerate an older shipped pkg zip
        from graphzeppelin_spark.hostmeter import triad_gbps
    except ImportError:
        def triad_gbps():
            return None
    from graphzeppelin_spark.operators.pagerank import pagerank_df
    from graphzeppelin_spark.operators.sketch_cc import SketchCC
    from graphzeppelin_spark.session import aqe_off

    cache = f"/tmp/gz_bench_kron_{scale}_{ef}.parquet"
    stream = spark.read.parquet(cache)
    n_updates = stream.count()
    n = 1 << scale
    alg = SketchCC(spark, num_vertices=n, seed=42, samples_factor=0.5,
                   num_partitions=max(2 * total_cores, 16))

    out: dict = {
        "master": sc.master,
        "total_cores": total_cores,
        "n_updates": int(n_updates),
        # single-core memory-bandwidth covariate at session start: the
        # cross-session drift shows up at <1% steal, so bandwidth/LLC
        # contention (invisible to steal) is the remaining suspect — a
        # drifting session with a drifting triad is host interference
        "triad_gbps_start": triad_gbps(),
    }
    session_meter = StealMeter()
    with aqe_off(spark):
        alg.build_state(stream).count()  # warm-up (python workers, scan)
        ingest_runs, ingest_steal, state = [], [], None
        for _ in range(runs):
            if state is not None:
                state.unpersist()
            meter = StealMeter()
            t0 = time.time()
            state = alg.build_state(stream).persist()
            state.count()
            ingest_runs.append(time.time() - t0)
            # hypervisor steal% over THIS run's window: the contention
            # covariate for the published time (hostmeter.py)
            ingest_steal.append(meter.steal_pct())
    out["ingest_runs_sec"] = [round(r, 2) for r in ingest_runs]
    out["ingest_steal_pcts"] = ingest_steal
    out["ingest_sec"] = round(min(ingest_runs), 2)
    out["updates_per_sec"] = round(n_updates / min(ingest_runs), 1)

    cc_runs = []
    labels = None
    for _ in range(max(runs - 1, 1)):
        t0 = time.time()
        labels, _ = alg.boruvka(state)
        cc_runs.append(time.time() - t0)
    out["cc_sec"] = round(min(cc_runs), 2)
    out["n_components"] = int(len(np.unique(labels)))

    t0 = time.time()
    # complete=True: full-universe labeling (implicit singletons unioned in),
    # so this count is directly comparable to n_components from driver-DSU
    dcc = alg.connected_components_distributed(state, complete=True)
    out["distributed_cc_components"] = int(
        dcc.select("component").distinct().count()
    )
    out["distributed_cc_sec"] = round(time.time() - t0, 2)
    out["cc_paths_agree"] = out["distributed_cc_components"] == out["n_components"]

    from pyspark.sql import functions as F

    live = (
        stream.groupBy("src", "dst")
        .agg(F.expr("sum(case when type = 0 then 1 else -1 end)").alias("net"))
        .where("net > 0")
        .select("src", "dst")
        .persist()
    )
    live.count()  # materialize OUTSIDE the pagerank timing (pagerank scans
    # the edge table twice at setup; an un-persisted 143M-row aggregation
    # would dominate the measurement)
    verts = spark.range(n).selectExpr("id as v")
    t0 = time.time()
    s = (
        pagerank_df(live, vertices=verts, num_iters=5)
        .agg(F.sum("score"))
        .collect()[0][0]
    )
    out["pagerank_x5_sec"] = round(time.time() - t0, 2)
    out["pagerank_score_sum"] = round(float(s), 6)
    out["session_steal_pct"] = session_meter.steal_pct()

    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
