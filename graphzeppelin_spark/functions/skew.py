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


def _row_salt(df: DataFrame, salt: int, salt_cols: list[str] | None) -> Column:
    """DETERMINISTIC per-row salt: pmod(xxhash64(row identity), salt).

    Never use spark_partition_id()/monotonically_increasing_id()/rand() as a
    shuffle key: a map-task retry after a fetch failure re-evaluates them
    differently, and reducers that already fetched the old output see a row
    under two salts (duplicated/dropped join or agg rows). A content hash is
    stable across retries; the caveat is that IDENTICAL rows share a salt,
    so pass salt_cols covering a distinguishing column when the skewed key's
    rows are exact duplicates."""
    cols = salt_cols if salt_cols is not None else list(df.columns)
    return F.pmod(F.xxhash64(*cols), F.lit(salt))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    partial_aggs: output-name -> aggregate expression over the raw rows
    final_aggs:   output-name -> aggregate expression over the stage-1 columns
    salt_cols:    row-identity columns for the deterministic salt (default:
                  all columns — see _row_salt for the duplicates caveat)
    """
    salted = df.withColumn("_salt", _row_salt(df, salt, salt_cols))
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
    fact_s = fact.withColumn("_salt", _row_salt(fact, salt, None))
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return fact_s.join(dim_s, [on, "_salt"], how).drop("_salt")


def salted_degrees(edges: DataFrame, salt: int = 16) -> DataFrame:
    """(v, degree) with explicit hub salting — two bounded-fan-in stages.

    The endpoint rows carry (src, dst, side) so the deterministic salt has a
    distinct identity per row even though a hub's `v` values are identical."""
    bi = edges.select(
        F.col("src").alias("v"), "src", "dst", F.lit(0).alias("side")
    ).unionAll(
        edges.select(F.col("dst").alias("v"), "src", "dst", F.lit(1).alias("side"))
    )
    return salted_agg(
        bi,
        ["v"],
        {"c": F.count("*")},
        {"degree": F.sum("c")},
        salt=salt,
        salt_cols=["src", "dst", "side"],
    )
