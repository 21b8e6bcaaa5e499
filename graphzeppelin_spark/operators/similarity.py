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


def ivf_train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    kmeans_iters: int = 5,
    sample_stride: int = 1,
    seed: int = 42,
) -> np.ndarray:
    """Mini k-means on a deterministic sample, driver-side.

    The sample is vec_id % sample_stride == 0 (bounded collect); production
    at 10^12 rows would run the same Lloyd iterations distributively
    (assign = mapInPandas argmax, recenter = groupBy(centroid).avg) — the
    index *structure* downstream is identical."""
    pdf = embeddings.where(F.col("vec_id") % sample_stride == 0).select(
        "embedding"
    ).toPandas()
    x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _ivf_assign(df: DataFrame, cent: np.ndarray, nprobe: int, id_col: str) -> DataFrame:
    """(id, centroid) — top-nprobe nearest centroids per vector (nprobe=1 for
    the corpus side, >1 for multi-probe queries)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("centroid", T.IntegerType(), False),
        ]
    )

    def _assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            sims = x @ cent.T
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            ids = pdf["vec_id"].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, nprobe),
                    "centroid": top.reshape(-1).astype(np.int32),
                }
            )

    return df.select("vec_id", "embedding").mapInPandas(_assign, schema=schema)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: corpus vectors
    bucketed by nearest centroid, queries probe their nprobe nearest lists,
    exact cosine rerank within the probed lists. The scale path's candidate
    set is ~nprobe/n_centroids of the corpus per query."""
    cent = ivf_train_centroids(embeddings, n_centroids=n_centroids, seed=seed)
    corpus_lists = _ivf_assign(embeddings, cent, 1, "neighbor_id")
    query_probes = _ivf_assign(queries, cent, nprobe, "query_id")
    cands = (
        query_probes.join(corpus_lists, "centroid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = cands.join(
        _scored(queries, embeddings), ["query_id", "neighbor_id"]
    ).withColumn("score", F.round("cos", round_digits))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
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
