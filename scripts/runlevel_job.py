"""Minimal spark-submit job for the RUN-LEVEL interleaved scaling bench
(round-6 verdict next-round #1a).

One session = one warm-up build_state + ONE timed ingest run, nothing else —
the session lives ~1-2 minutes, so an adjacent (1-exec, 4-exec) session pair
shares a tight window and the measured minute-scale monotone host drift
cancels inside the pair's efficiency ratio. Contrast scripts/multiexec_job.py,
which times a whole battery (K ingest runs + CC + distributed CC + pagerank,
~8 min/session) and therefore can only pair at session granularity.

argv: scale edge_factor total_cores. Prints one `RESULT {...}` JSON line:
warmup_sec, ingest_sec, steal% per phase, triad covariate.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    scale, ef = int(sys.argv[1]), int(sys.argv[2])
    total_cores = int(sys.argv[3])
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("gz_runlevel").getOrCreate()
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

    from graphzeppelin_spark.hostmeter import StealMeter

    try:
        from graphzeppelin_spark.hostmeter import triad_gbps
    except ImportError:
        def triad_gbps():
            return None
    from graphzeppelin_spark.operators.sketch_cc import SketchCC
    from graphzeppelin_spark.session import aqe_off

    cache = f"/tmp/gz_bench_kron_{scale}_{ef}.parquet"
    stream = spark.read.parquet(cache)
    n_updates = stream.count()
    alg = SketchCC(spark, num_vertices=1 << scale, seed=42, samples_factor=0.5,
                   num_partitions=max(2 * total_cores, 16))

    out: dict = {
        "master": sc.master,
        "total_cores": total_cores,
        "n_updates": int(n_updates),
        "triad_gbps": triad_gbps(),
    }
    with aqe_off(spark):
        wm = StealMeter()
        t0 = time.time()
        alg.build_state(stream).count()  # warm-up (python workers, scan cache)
        out["warmup_sec"] = round(time.time() - t0, 2)
        out["warmup_steal_pct"] = wm.steal_pct()

        meter = StealMeter()
        t0 = time.time()
        alg.build_state(stream).count()
        out["ingest_sec"] = round(time.time() - t0, 2)
        out["ingest_steal_pct"] = meter.steal_pct()
    out["updates_per_sec"] = round(n_updates / out["ingest_sec"], 1)

    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
