"""Edge-table primitives: canonicalization, bidirection, toggle-parity materialization.

The engine's graph model matches the reference (SURVEY.md §1.1): undirected,
no self-edges or multi-edges, vertex ids in [0, num_vertices). The
edge-update stream (seq, type, src, dst) has XOR/toggle semantics — the live
graph at seq t is the set of canonical edges seen an odd number of times
before t (reference test/util/graph_verifier.cpp:62).

All of these are pure DataFrame expressions: Catalyst pushes the seq filter
into the parquet scan and plans the parity group-by as a partial+final
hash aggregate (map-side combine), so at 100 TB the shuffle carries one row
per distinct edge, not per update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Orient every edge (lo, hi) with lo < hi; drop self-loops."""
    other = [c for c in edges.columns if c not in (src, dst)]
    return (
        edges.where(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("src"),
            F.greatest(src, dst).alias("dst"),
            *other,
        )
    )


def bidirect(edges: DataFrame) -> DataFrame:
    """Each undirected edge as two directed rows — the Spark image of the
    reference's double gutter insert (graph_sketch_driver.h:171-172)."""
    return edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def live_edges_df(stream: DataFrame, upto_seq: int | None = None) -> DataFrame:
    """Materialize the live graph from a toggle stream: parity group-by.

    Equivalent SQL: SELECT src, dst FROM (canonicalized stream [seq < t])
    GROUP BY src, dst HAVING count(*) % 2 = 1.
    """
    s = stream if upto_seq is None else stream.where(F.col("seq") < F.lit(upto_seq))
    return (
        canonicalize(s.select("src", "dst"))
        .groupBy("src", "dst")
        .count()
        .where(F.col("count") % 2 == 1)
        .select("src", "dst")
    )


def vertices_of(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing in the edge table."""
    return (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(v, degree) over canonical undirected edges."""
    return (
        bidirect(edges)
        .groupBy(F.col("src").alias("v"))
        .agg(F.count("*").alias("degree"))
    )
