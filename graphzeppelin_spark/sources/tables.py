"""Bucketed table sinks — the shuffle-free co-located join path at scale.

At 100 TB the dominant cost of a repeated big-big join (edges ⋈ labels,
edges ⋈ edges for triangles, shingles ⋈ shingles) is the exchange of the fact
side on every query. Spark's bucketing amortizes it to WRITE time: a table
written with `bucketBy(n, key)` + `sortBy(key)` is hash-partitioned on disk,
and a join of two tables bucketed the same way needs NO Exchange at read
time (plan-asserted in tests/test_plans.py) — the scan itself carries the
partitioning guarantee. This is the on-disk analog of the engine's
`repartition(vertex)` ingest discipline, and the layout an Iceberg/Delta
deployment would declare as a table property.

Local notes: bucketed tables go through the session catalog
(`saveAsTable`, warehouse dir under spark.sql.warehouse.dir); plain
parquet `save()` cannot carry bucket metadata. Reading back requires
`spark.table(name)`, not `spark.read.parquet(path)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed+sorted managed table keyed on bucket_cols."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(name)
    )


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — preserves the bucketing guarantee (parquet-path reads
    would drop it)."""
    return spark.table(name)
