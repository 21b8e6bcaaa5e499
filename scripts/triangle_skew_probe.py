"""Triangle counting on a power-law graph (round-6 verdict next-round #5).

The three triangle contract queries are oracle-gated on 200-vertex
circulants only — no hub has ever met the CSR-blocked path. This probe runs
triangle_count_csr (adjacency.py: degree-ordered orientation -> per-partition
CSR wedge generation -> closure semi-join) and the relational join path on
kron_17 live edges (heavy power-law skew) and records the evidence that the
orientation actually bounds per-task work at hubs:

- raw max degree vs max ORIENTED out-degree (the orientation sends a hub's
  edges toward higher-(degree,id) endpoints, so hub out-lists collapse);
- total wedges = sum_u C(out(u),2) and the per-partition wedge distribution
  (max/median) — reducer-blowup evidence;
- cross-implementation agreement (CSR count == join count) + wall times.

Writes BENCH/triangle_skew.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from graphzeppelin_spark import get_spark  # noqa: E402
from graphzeppelin_spark.hostmeter import StealMeter  # noqa: E402

SCALE = int(os.environ.get("SPARK_GRAFT_TRI_SCALE", "17"))
EF = 256 if SCALE >= 17 else 64


def main() -> None:
    from graphzeppelin_spark.functions.edges import degrees
    from graphzeppelin_spark.operators.adjacency import (
        triangle_count_csr,
        wedges_csr,
    )
    from graphzeppelin_spark.operators.triangles import (
        _oriented,
        triangle_count_df,
    )

    spark = get_spark(app_name="gz_tri_skew", cores=32, shuffle_partitions=64)
    cache = f"/tmp/gz_bench_kron_{SCALE}_{EF}.parquet"
    if not os.path.exists(cache):
        from graphzeppelin_spark.sources.generators import kron_stream

        pdf = kron_stream(scale=SCALE, edge_factor=EF, seed=42)
        spark.createDataFrame(pdf).repartition(64).write.parquet(cache)
    stream = spark.read.parquet(cache)
    live = (
        stream.groupBy("src", "dst")
        .agg(F.expr("sum(case when type = 0 then 1 else -1 end)").alias("net"))
        .where("net > 0")
        .select(F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    m = live.count()
    out: dict = {"scale": SCALE, "edge_factor": EF, "n_edges": int(m)}

    deg = degrees(live).persist()
    out["max_degree_raw"] = int(deg.agg(F.max("degree")).collect()[0][0])
    o = _oriented(live).persist()
    outdeg = o.groupBy("u").count()
    row = outdeg.agg(F.max("count").alias("mx"),
                     F.expr("percentile_approx(count, 0.5)").alias("med")).collect()[0]
    out["max_outdeg_oriented"] = int(row["mx"])
    out["median_outdeg_oriented"] = int(row["med"])
    out["sqrt_2m_bound"] = round((2 * m) ** 0.5, 1)
    # total wedges + per-partition wedge distribution (the per-task work)
    wl = (
        outdeg.withColumn("p", F.pmod(F.xxhash64("u"), F.lit(128)))
        .groupBy("p")
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("wedges"))
    )
    wrow = wl.agg(F.sum("wedges").alias("t"), F.max("wedges").alias("mx"),
                  F.expr("percentile_approx(wedges, 0.5)").alias("med")).collect()[0]
    out["total_wedges"] = int(wrow["t"])
    out["max_partition_wedges"] = int(wrow["mx"])
    out["median_partition_wedges"] = int(wrow["med"])
    out["partition_skew_max_over_median"] = round(
        wrow["mx"] / max(wrow["med"], 1), 2)
    deg.unpersist()
    o.unpersist()

    # three physical strategies for the same count: broadcast-closure CSR
    # (wedges never exported — per-partition searchsorted counts), the
    # wedge-exporting CSR semi-join (the >64M-edge fallback), and the
    # relational self-join
    paths = (
        ("csr_bcast", 2, lambda: triangle_count_csr(live, 128)),
        ("csr_semijoin", 1,
         lambda: triangle_count_csr(live, 128, broadcast_max_edges=0)),
        ("join", 1, lambda: triangle_count_df(live)),
    )
    for name, n_runs, fn in paths:
        runs = []
        for _ in range(n_runs):
            meter = StealMeter()
            t0 = time.time()
            cnt = fn().collect()[0]["n_triangles"]
            runs.append(round(time.time() - t0, 2))
        out[f"triangles_{name}"] = int(cnt)
        out[f"{name}_runs_sec"] = runs
        out[f"{name}_sec"] = min(runs)
        out[f"{name}_steal_pct"] = meter.steal_pct()
        print(f"{name}: {cnt} triangles in {min(runs)}s", file=sys.stderr)
    out["paths_agree"] = (
        out["triangles_csr_bcast"] == out["triangles_csr_semijoin"]
        == out["triangles_join"]
    )
    live.unpersist()

    with open(os.path.join(REPO, "BENCH", "triangle_skew.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
