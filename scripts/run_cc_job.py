"""Cluster job entry point — north_rule: `spark-submit --py-files` deployment.

Package and submit:

    cd /root/repo && zip -r /tmp/gzspark.zip graphzeppelin_spark
    spark-submit --py-files /tmp/gzspark.zip scripts/run_cc_job.py \
        --stream /data/edge_updates.parquet --num-vertices 131072 \
        --checkpoint /data/ckpt --upto 1000000 --query cc

On a cluster the session comes from the submit environment (no .master()
override); locally it falls back to local[*]. The job is resumable: if the
checkpoint dir has a snapshot, it continues from the committed watermark.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--stream", required=True, help="parquet path of (seq,type,src,dst)")
    p.add_argument("--num-vertices", type=int, required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--upto", type=int, default=None, help="breakpoint seq (default: all)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--query", choices=["cc", "forest", "pagerank", "none"], default="cc")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("graphzeppelin_cc_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from graphzeppelin_spark.streaming.driver import GraphStreamDriver

    stream = spark.read.parquet(args.stream)
    resumed = False
    if args.checkpoint:
        try:
            drv = GraphStreamDriver.resume(spark, stream, args.checkpoint)
            resumed = True
        except FileNotFoundError:
            drv = GraphStreamDriver(
                spark, stream, args.num_vertices, seed=args.seed,
                checkpoint_dir=args.checkpoint,
            )
    else:
        drv = GraphStreamDriver(spark, stream, args.num_vertices, seed=args.seed)

    upto = args.upto
    if upto is None:
        upto = stream.agg({"seq": "max"}).collect()[0][0] + 1
    drv.process_stream_until(upto, batch_size=args.batch_size)

    out: dict = {
        "resumed": resumed,
        "applied_seq": drv.applied_seq,
        "ingest_metrics": drv.metrics,
    }
    if args.query == "cc":
        labels = drv.connected_components()
        import numpy as np

        out["num_components"] = int(len(np.unique(labels)))
    elif args.query == "forest":
        out["forest_edges"] = int(len(drv.spanning_forest()))
    elif args.query == "pagerank":
        from pyspark.sql import functions as F

        from graphzeppelin_spark.functions.edges import live_edges_df
        from graphzeppelin_spark.operators.pagerank import pagerank_df

        pr_ck = f"{args.checkpoint}/pagerank" if args.checkpoint else None
        scores = pagerank_df(
            live_edges_df(stream.where(F.col("seq") < upto)), checkpoint_dir=pr_ck
        )
        out["pagerank_top"] = [
            [int(r["v"]), float(r["score"])]
            for r in scores.orderBy("score", ascending=False).limit(5).collect()
        ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
