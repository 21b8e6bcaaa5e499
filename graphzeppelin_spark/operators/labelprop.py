"""Label propagation over an edge DataFrame.

Deterministic synchronous variant (FIXTURES.md §3): every vertex starts with
label = its own id; each superstep every vertex adopts the minimum label among
itself and its neighbors; fixpoint. (The min-rule makes the fixpoint exactly
the connected-component min-labeling, which gives an exact oracle; the classic
mode-label community variant is non-deterministic under ties and is exposed
via `rule="mode"` for completeness, tie-broken by smallest label.)

One shuffle per superstep (groupBy(v) of neighbor labels — min/mode both
partial-aggregable; mode uses count-per-(v,label) then argmax, two shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphzeppelin_spark.functions.edges import bidirect, vertices_of


def label_propagation_df(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 30,
    rule: str = "min",
    jump: bool = True,
) -> DataFrame:
    """Return (v:long, label:long).

    jump (min rule only): add a pointer-jumping step label(v) <- label(label(v))
    per superstep — labels are vertex ids, so this reaches the same min-label
    fixpoint in O(log d) instead of O(d) rounds on high-diameter graphs."""
    verts = vertices if vertices is not None else vertices_of(edges)
    labels = verts.select(F.col("v").cast("long"), F.col("v").cast("long").alias("label"))
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # size-gated plan shape, same discipline and same measured rationale as
    # pagerank_df: big graphs partition the immutable edge table ONCE on the
    # superstep join key and broadcast the skinny label tables (≤4M
    # vertices); small graphs keep the plain AQE-coalesced shuffle plan
    # (per-superstep broadcast construction costs more than it saves there)
    big_edges = edges.count() * 2 >= 1_000_000
    edges_bi = bidirect(edges)
    if big_edges:
        edges_bi = edges_bi.repartition(n_part, "src")
    edges_bi = edges_bi.persist()
    edges_bi.count()

    labels = labels.persist()
    n_verts = labels.count()
    broadcast_labels = big_edges and n_verts <= 4_000_000  # conservative broadcast-fit ceiling, see pagerank_df

    def _sig(df: DataFrame) -> int:
        # order-insensitive content hash in one job (fixpoint detection)
        return int(
            df.agg(
                F.sum(F.xxhash64("v", "label").cast("decimal(38,0)")).alias("h")
            ).collect()[0]["h"]
            or 0
        )

    cur_sig = _sig(labels)
    for _ in range(max_iters):
        lbl = F.broadcast(labels) if broadcast_labels else labels
        nbr = edges_bi.join(lbl, edges_bi.src == lbl.v).select(
            F.col("dst").alias("v2"), "label"
        )
        if rule == "min":
            agg = nbr.groupBy("v2").agg(F.min("label").alias("nbr_label"))
        elif rule == "mode":
            counted = nbr.groupBy("v2", "label").agg(F.count("*").alias("c"))
            w = Window.partitionBy("v2").orderBy(F.desc("c"), F.asc("label"))
            agg = (
                counted.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("v2", F.col("label").alias("nbr_label"))
            )
        else:
            raise ValueError(f"unknown rule: {rule}")
        if broadcast_labels:
            agg = F.broadcast(agg)
        stepped = labels.join(agg, labels.v == F.col("v2"), "left").select(
            labels.v,
            (
                F.least("label", F.coalesce("nbr_label", "label"))
                if rule == "min"
                else F.coalesce("nbr_label", "label")
            ).alias("label"),
        )
        if rule == "min" and jump:
            mapping = stepped.select(
                F.col("v").alias("mv"), F.col("label").alias("mlabel")
            )
            if broadcast_labels:
                mapping = F.broadcast(mapping)
            stepped = stepped.join(
                mapping, stepped.label == mapping.mv, "left"
            ).select(
                stepped.v,
                F.least(stepped.label, F.coalesce("mlabel", stepped.label)).alias(
                    "label"
                ),
            )
        new_labels = stepped.localCheckpoint(eager=True)
        new_sig = _sig(new_labels)
        labels.unpersist()
        from graphzeppelin_spark.session import free_local_checkpoint

        free_local_checkpoint(labels)  # no-op for the initial persisted plan
        labels = new_labels
        if new_sig == cur_sig:
            break
        cur_sig = new_sig
    edges_bi.unpersist()
    return labels.select("v", "label")
