"""Explicit skew salting for power-law keys (BASELINE.json north_rule).

Spark's map-side partial aggregation already collapses hub fan-in for
algebraic aggregates, and AQE splits skewed join partitions — but two cases
still need *explicit* salting on web graphs:

1. non-algebraic / holistic aggregates (collect_list, exact distinct counts,
   the sketch merge when inputs are pre-grouped rows rather than partial
   states): a hub key lands all its rows on one reducer;
2. joins against a hub-keyed fact side too large to broadcast.

`salted_agg` implements the standard two-stage pattern: scatter each key into
`salt` sub-keys, aggregate per (key, salt) [stage 1 bounds any reducer's rows
at ~rows(key)/salt], then combine the sub-aggregates [stage 2 sees at most
`salt` rows per key]. Valid for any associative aggregate given its
(partial, final) expression pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    partial_aggs: output-name -> aggregate expression over the raw rows
    final_aggs:   output-name -> aggregate expression over the stage-1 columns
    """
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)))
    stage1 = salted.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return stage1.groupBy(*key_cols).agg(
        *[expr.alias(name) for name, expr in final_aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for a hub-keyed fact side against a dim side too
    large to broadcast (case 2 in the module docstring).

    The fact side scatters each row into one of `salt` sub-keys; the dim
    side replicates `salt` ways — so a hub key's rows spread across `salt`
    reducers instead of one. Cost: dim is duplicated salt times through the
    shuffle, which is why this exists as an EXPLICIT tool (use broadcast for
    small dims, AQE skew-join for mild skew; salt for the power-law hubs
    that exceed both). Supports inner and left joins (right/full would need
    dim-side dedup of the unmatched replicas)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    fact_s = fact.withColumn(
        "_salt",
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)),
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return fact_s.join(dim_s, [on, "_salt"], how).drop("_salt")


def salted_degrees(edges: DataFrame, salt: int = 16) -> DataFrame:
    """(v, degree) with explicit hub salting — two bounded-fan-in stages."""
    bi = edges.select(F.col("src").alias("v")).unionAll(
        edges.select(F.col("dst").alias("v"))
    )
    return salted_agg(
        bi,
        ["v"],
        {"c": F.count("*")},
        {"degree": F.sum("c")},
        salt=salt,
    )
