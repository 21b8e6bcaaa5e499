"""Triangle counting via degree-ordered edge orientation + 2-path closure join.

The textbook shuffle-efficient plan (BASELINE.json north_rule): orient every
undirected edge from the lower-(degree, id) endpoint to the higher one; every
triangle then has exactly one "apex" vertex with two out-edges, so

    triangles = wedges(apex) ⋉ edges

Degree ordering bounds the out-degree of every vertex by O(sqrt(m)) on any
graph, so the self-join of out-adjacency never explodes on power-law hubs —
this IS the skew handling for triangle counting, no salting needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphzeppelin_spark.functions.edges import degrees


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient canonical edges by (degree, id): low endpoint -> high endpoint."""
    deg = degrees(edges)
    ds = deg.select(F.col("v").alias("sv"), F.col("degree").alias("sdeg"))
    dd = deg.select(F.col("v").alias("dv"), F.col("degree").alias("ddeg"))
    e = edges.join(ds, edges.src == ds.sv).join(dd, edges.dst == dd.dv)
    src_first = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("w"),
    )


def _triangle_rows(edges: DataFrame) -> DataFrame:
    """(u, v1, v2) — one row per triangle (apex u; v1 < v2 by vertex id)."""
    o = _oriented(edges)
    a = o.select(F.col("u"), F.col("w").alias("v1"))
    b = o.select(F.col("u"), F.col("w").alias("v2"))
    wedges = a.join(b, "u").where(F.col("v1") < F.col("v2"))
    # closing edges are canonical (src<dst), exactly the input edge set
    closing = edges.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    return wedges.join(closing, ["v1", "v2"], "left_semi")


def triangle_count_df(edges: DataFrame) -> DataFrame:
    """Return a 1-row DataFrame (n_triangles: long). `edges` canonical undirected."""
    return _triangle_rows(edges).agg(F.count("*").alias("n_triangles"))


def triangles_per_vertex_df(edges: DataFrame) -> DataFrame:
    """Return (v: long, tri: long) — triangles incident to each vertex (vertices
    in no triangle are omitted)."""
    tris = _triangle_rows(edges)
    return (
        tris.select(F.col("u").alias("v"))
        .unionAll(tris.select(F.col("v1").alias("v")))
        .unionAll(tris.select(F.col("v2").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("tri"))
    )
