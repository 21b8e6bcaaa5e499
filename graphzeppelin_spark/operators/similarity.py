"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force exact top-k per query vector. The dot product is a
  JVM-side zip_with/aggregate expression — no Python in the hot loop; the
  per-query top-k is a window row_number over the scored pairs.
- lsh_topk: random-hyperplane LSH bucketing (seeded, deterministic) with
  multi-probe via several independent tables, then exact scoring of ONLY the
  candidate pairs — the scale path: candidate set is ~bucket-sized instead
  of n, and the cosine expression is evaluated on the joined candidate rows
  (never via a queries x corpus cross join).
- ivf_topk: inverted-file index over k-means centroids trained with
  DISTRIBUTED Lloyd iterations (assign = vectorized mapInPandas argmax
  against the broadcast centroids, recenter = groupBy(centroid) average of
  the embedding arrays in the JVM) — no full-corpus driver collect anywhere.

Scale notes: brute force is O(n_queries * n) — fine for reranking, wrong as
the primary index at 10^12; the bucketed paths shuffle each vector to
(table, bucket) / centroid keys so the join fan-out is bounded by bucket
occupancy. Centroids are O(n_centroids * dim) — broadcast-sized by
construction (the classic IVF regime: n_centroids ~ sqrt(n)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_norm(df: DataFrame, id_alias: str, vec_alias: str, norm_alias: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(id_alias),
        F.col("embedding").cast("array<double>").alias(vec_alias),
        F.sqrt(
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x)
        ).alias(norm_alias),
    )


def _cosine_col() -> "F.Column":
    return F.aggregate(
        F.zip_with("vq", "vc", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    ) / (F.col("nq") * F.col("nc"))


def _score_pairs(
    pairs: DataFrame, queries: DataFrame, corpus: DataFrame, round_digits: int
) -> DataFrame:
    """Exact cosine for (query_id, neighbor_id) pairs: join each side's
    embedding onto the pair rows and evaluate the dot product there — the
    candidate pruning therefore actually prunes compute (a join against a
    crossJoin-derived scored table would re-score the full n_q x n matrix)."""
    q = _with_norm(queries, "query_id", "vq", "nq")
    c = _with_norm(corpus, "neighbor_id", "vc", "nc")
    return (
        pairs.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn("score", F.round(_cosine_col(), round_digits))
        .select("query_id", "neighbor_id", "score")
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "score")
    )


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, round_digits: int = 4
) -> DataFrame:
    """(query_id, neighbor_id, score) exact top-k by cosine.

    Ranking uses (round(cos), neighbor_id) so results are stable across
    engines and float summation orders."""
    q = _with_norm(queries, "query_id", "vq", "nq")
    c = _with_norm(embeddings, "neighbor_id", "vc", "nc")
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(_cosine_col(), round_digits))
        .select("query_id", "neighbor_id", "score")
    )
    return _topk(scored, k)


_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("table", T.IntegerType(), False),
        T.StructField("bucket", T.LongType(), False),
    ]
)


def auto_num_planes(n_vectors: int, target_bucket: int = 32,
                    lo: int = 8, hi: int = 24) -> int:
    """Hyperplane count keeping expected bucket occupancy ~target_bucket.

    Fixed plane counts saturate: 2^planes buckets per table, so candidate
    pairs per bucket grow quadratically once n >> 2^planes * target — the
    round-7 scale probe measured 90x candidate growth at a 10x corpus with
    8 planes (BENCH/dedup_scale.json). 2^planes ~= n / target keeps
    per-bucket occupancy (and so per-query candidate cost) ~constant as
    the corpus grows — the 100TB knob. Resolve ONCE per operator call from
    the CORPUS side and pass the concrete value everywhere (queries bucketed
    with a different plane count land in a different hash space)."""
    import math

    return max(lo, min(hi, math.ceil(
        math.log2(max(n_vectors, 1) / target_bucket + 1))))


def lsh_buckets(
    embeddings: DataFrame, num_tables: int = 8, num_planes: int = 10, seed: int = 42
) -> DataFrame:
    """(vec_id, table, bucket): sign pattern of seeded random hyperplanes.

    Planes are regenerated deterministically inside each task from the seed —
    nothing is broadcast, so the op scales to any corpus size."""

    def _bucketize(batches):
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
    seed: int = 42,
) -> np.ndarray:
    """Spherical mini k-means, trained DISTRIBUTED (Lloyd iterations):

    - init: n_centroids seeds picked by a deterministic hash order — a
      bounded collect of exactly n_centroids rows, never the corpus;
    - assign: vectorized numpy argmax against the (small, task-regenerated)
      current centroids inside mapInPandas;
    - recenter: groupBy(centroid) elementwise average of the embedding
      arrays, computed in the JVM via posexplode + avg — the only data
      collected per iteration is the (n_centroids x dim) centroid matrix.

    The driver never holds more than n_centroids * dim floats (the IVF index
    contract: centroids are broadcast-sized)."""
    norm = embeddings.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: x.cast("double")
            / F.sqrt(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda a, y: a + y.cast("double") * y
                )
                + F.lit(1e-12)
            ),
        ).alias("v"),
    )
    init_rows = (
        norm.withColumn("h", F.xxhash64(F.col("vec_id") + F.lit(seed)))
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    cent = np.array([r["v"] for r in init_rows], dtype=np.float64)

    assign_schema = T.StructType(
        [
            T.StructField("centroid", T.IntegerType(), False),
            T.StructField("v", T.ArrayType(T.DoubleType()), False),
        ]
    )
    for _ in range(kmeans_iters):
        cur = cent  # captured by value in the closure below

        def _assign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.array(pdf["v"].tolist(), dtype=np.float64)
                a = np.argmax(x @ cur.T, axis=1).astype(np.int32)
                yield pd.DataFrame({"centroid": a, "v": pdf["v"]})

        assigned = norm.mapInPandas(_assign, schema=assign_schema)
        means = (
            assigned.select("centroid", F.posexplode("v").alias("pos", "x"))
            .groupBy("centroid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = cent.copy()
        by_c: dict[int, list[tuple[int, float]]] = {}
        for r in means:
            by_c.setdefault(r["centroid"], []).append((r["pos"], r["m"]))
        for cidx, pm in by_c.items():
            vec = np.array([m for _, m in sorted(pm)], dtype=np.float64)
            nv = np.linalg.norm(vec)
            if nv > 1e-12:
                new[cidx] = vec / nv
        cent = new
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
    n_centroids: int | None = 16,
    nprobe: int = 4,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: corpus vectors
    bucketed by nearest centroid, queries probe their nprobe nearest lists,
    exact cosine rerank computed on the candidate pairs only. The scale
    path's candidate set is ~nprobe/n_centroids of the corpus per query.

    n_centroids=None auto-sizes to ~sqrt(n) (clamped [16, 4096]) — the
    standard IVF balance: per-query candidates ~ nprobe*sqrt(n) instead of
    growing linearly with the corpus at a fixed list count (the round-7
    scale probe measured 25x candidate growth at a 10x corpus with the
    count held fixed, BENCH/dedup_scale.json)."""
    if n_centroids is None:
        import math

        n_corpus = embeddings.count()
        n_centroids = max(16, min(4096, math.ceil(math.sqrt(n_corpus))))
    cent = ivf_train_centroids(embeddings, n_centroids=n_centroids, seed=seed)
    corpus_lists = _ivf_assign(embeddings, cent, 1, "neighbor_id")
    query_probes = _ivf_assign(queries, cent, nprobe, "query_id")
    cands = (
        query_probes.join(corpus_lists, "centroid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _topk(_score_pairs(cands, queries, embeddings, round_digits), k)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_tables: int = 8,
    num_planes: int | None = 10,
    seed: int = 42,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any table, then
    exact cosine on the candidate pairs + window top-k. Recall grows with
    num_tables; num_planes=None auto-sizes bucket occupancy to the corpus
    (auto_num_planes), resolved ONCE here so corpus and queries hash with
    the same planes."""
    if num_planes is None:
        num_planes = auto_num_planes(embeddings.count())
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
    return _topk(_score_pairs(cands, queries, embeddings, round_digits), k)


def ann_recall_at_k(
    embeddings: DataFrame,
    queries: DataFrame,
    ann_result: DataFrame,
    k: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """(query_id, hits, recall) — fraction of the EXACT top-k (ties included
    by the deterministic (score, neighbor_id) order) that the ANN result
    returned. The ANN correctness gate: deterministic given seeded hashes, so
    an oracle can assert the expected recall exactly."""
    exact = cosine_topk(embeddings, queries, k=k, round_digits=round_digits)
    hits = (
        exact.join(
            ann_result.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    base = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("hits", F.lit(0)).alias("hits"),
        F.round(
            F.coalesce("hits", F.lit(0)) / F.col("n_exact"), 6
        ).alias("recall"),
    )


# ------------------------------------------------------- persisted IVF index


def ivf_write_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    kmeans_iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Build an IVF index ONCE and persist it: `path/centroids` (the
    n_centroids x dim matrix, broadcast-sized) and `path/lists` — the corpus
    (vec_id, embedding) written as parquet PARTITIONED BY centroid. The
    layout is the index: probing nprobe lists at search time reads
    ~nprobe/n_centroids of the data via partition pruning (Spark's dynamic
    partition pruning fires on the broadcast probe⋈lists join), which is the
    ivf_topk candidate bound enforced by the storage layer instead of a
    shuffle. Returns the trained centroids."""
    spark = embeddings.sparkSession
    cent = ivf_train_centroids(
        embeddings, n_centroids=n_centroids, kmeans_iters=kmeans_iters, seed=seed
    )
    spark.createDataFrame(
        pd.DataFrame({"centroid": np.arange(len(cent), dtype=np.int32), "v": cent.tolist()})
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    lists = _ivf_assign(embeddings, cent, 1, "vec_id").join(
        embeddings.select("vec_id", "embedding"), "vec_id"
    )
    lists.write.partitionBy("centroid").mode("overwrite").parquet(f"{path}/lists")
    return cent


def ivf_read_centroids(spark, path: str) -> np.ndarray:
    rows = spark.read.parquet(f"{path}/centroids").orderBy("centroid").collect()
    return np.array([r["v"] for r in rows], dtype=np.float64)


def ivf_search(
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """Serve top-k from a persisted IVF index (see ivf_write_index). The
    query batch is assigned to its nprobe nearest centroids driver-free
    (centroids are a tiny collect), the probe table broadcasts into the
    partitioned lists scan (dynamic partition pruning bounds IO), and the
    exact cosine rerank runs on candidate pairs only."""
    spark = queries.sparkSession
    cent = ivf_read_centroids(spark, path)
    probes = _ivf_assign(queries, cent, nprobe, "query_id")
    lists = spark.read.parquet(f"{path}/lists")
    cands = (
        F.broadcast(probes)
        .join(lists, "centroid")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    corpus = lists.select("vec_id", "embedding")
    return _topk(_score_pairs(cands, queries, corpus, round_digits), k)
