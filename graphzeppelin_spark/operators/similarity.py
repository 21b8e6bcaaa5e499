"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force exact top-k per query vector. The dot product is a
  JVM-side zip_with/aggregate expression — no Python in the hot loop; the
  per-query top-k is a window row_number over the scored pairs.
- lsh_topk: random-hyperplane LSH bucketing (seeded, deterministic) with
  multi-probe via several independent tables, then exact scoring within
  buckets — the scale path: candidate set is ~bucket-sized instead of n.

Scale notes: brute force is O(n_queries * n) — fine for reranking, wrong as
the primary index at 10^12; the LSH path shuffles each vector to
(table, bucket) keys so the join fan-out is bounded by bucket occupancy.
An IVF variant would replace the hash with learned centroids but keep the
same bucket-join shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _scored(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("vq"),
        F.sqrt(
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x)
        ).alias("nq"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("vc"),
        F.sqrt(
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x)
        ).alias("nc"),
    )
    return (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.aggregate(
                F.zip_with("vq", "vc", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
            )
            / (F.col("nq") * F.col("nc")),
        )
        .select("query_id", "neighbor_id", "cos")
    )


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, round_digits: int = 4
) -> DataFrame:
    """(query_id, neighbor_id, score) exact top-k by cosine.

    Ranking uses (round(cos), neighbor_id) so results are stable across
    engines and float summation orders."""
    scored = _scored(queries, embeddings).withColumn(
        "score", F.round("cos", round_digits)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("table", T.IntegerType(), False),
        T.StructField("bucket", T.LongType(), False),
    ]
)


def lsh_buckets(
    embeddings: DataFrame, num_tables: int = 8, num_planes: int = 10, seed: int = 42
) -> DataFrame:
    """(vec_id, table, bucket): sign pattern of seeded random hyperplanes.

    Planes are regenerated deterministically inside each task from the seed —
    nothing is broadcast, so the op scales to any corpus size."""

    def _bucketize(batches):
        rng = np.random.default_rng(seed)
        dim_planes = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emb = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            d = emb.shape[1]
            if d not in dim_planes:
                g = np.random.default_rng(seed)
                dim_planes[d] = g.standard_normal((num_tables, num_planes, d))
            planes = dim_planes[d]
            ids = pdf["vec_id"].to_numpy(np.int64)
            out_id, out_t, out_b = [], [], []
            for t in range(num_tables):
                proj = emb @ planes[t].T  # (batch, planes)
                bits = (proj > 0).astype(np.int64)
                bucket = (bits << np.arange(num_planes, dtype=np.int64)).sum(axis=1)
                out_id.append(ids)
                out_t.append(np.full(len(ids), t, dtype=np.int32))
                out_b.append(bucket)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_id),
                    "table": np.concatenate(out_t),
                    "bucket": np.concatenate(out_b),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        _bucketize, schema=_BUCKET_SCHEMA
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_tables: int = 8,
    num_planes: int = 10,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any table, then
    exact cosine + window top-k. Recall grows with num_tables."""
    cb = lsh_buckets(embeddings, num_tables, num_planes, seed)
    qb = lsh_buckets(queries, num_tables, num_planes, seed).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cands = (
        qb.join(cb, ["table", "bucket"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    scored = (
        cands.join(
            _scored(queries, embeddings), ["query_id", "neighbor_id"]
        ).withColumn("score", F.round("cos", round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )
