"""CSR-blocked per-partition adjacency operators (BASELINE.json north_star).

The join-based operators express supersteps relationally; this module gives
the complementary physical strategy for kernels that iterate *within* a
partition: edges are hash-partitioned by source into blocks, each block's
adjacency materialized as a numpy CSR (indptr/indices) inside an Arrow task,
and the kernel (wedge generation, local label sweeps, ...) runs as
vectorized numpy over the block — no per-row Python, no JVM round-trips
inside the kernel.

Used here for triangle counting: degree-ordered orientation bounds every
adjacency list by O(sqrt m), wedges are generated vectorized per block, and
the closure check stays a relational semi-join against the (distributed)
edge table — local compute, global join, which is the shape that survives
10^12 edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphzeppelin_spark.operators.triangles import _oriented

WEDGE_SCHEMA = T.StructType(
    [
        T.StructField("v1", T.LongType(), False),
        T.StructField("v2", T.LongType(), False),
        T.StructField("apex", T.LongType(), False),
    ]
)


def _csr_from_pairs(u: np.ndarray, w: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build a local CSR: unique sources, indptr, column indices (w sorted by u)."""
    order = np.argsort(u, kind="stable")
    u_s, w_s = u[order], w[order]
    uniq, counts = np.unique(u_s, return_counts=True)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return uniq, indptr, w_s


def _wedges_from_csr(
    uniq: np.ndarray, indptr: np.ndarray, indices: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All ordered pairs (v1 < v2) within each row's adjacency list, vectorized.

    Row lists are degree-bounded by the orientation, so the pair blowup is
    sum_u C(out(u), 2) <= m * sqrt(m) worst case (standard bound)."""
    counts = np.diff(indptr)
    n_pairs = (counts * (counts - 1)) // 2
    total = int(n_pairs.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    apex = np.repeat(uniq, n_pairs)
    # per-row local pair index 0..n_pairs[r]-1
    pair_off = np.concatenate([[0], np.cumsum(n_pairs)])
    local = np.arange(total, dtype=np.int64) - np.repeat(pair_off[:-1], n_pairs)
    k = np.repeat(counts, n_pairs)
    # map local pair index -> (i, j) with i < j in the row's list (row-major
    # upper triangle): i = row of the triangle walk, j = remainder
    i = (
        k
        - 2
        - np.floor(np.sqrt(-8.0 * local + 4.0 * k * (k - 1) - 7) / 2.0 - 0.5)
    ).astype(np.int64)
    j = (local + i + 1 - (k * (k - 1)) // 2 + ((k - i) * ((k - i) - 1)) // 2).astype(
        np.int64
    )
    row_start = np.repeat(indptr[:-1], n_pairs)
    a = indices[row_start + i]
    b = indices[row_start + j]
    v1 = np.minimum(a, b)
    v2 = np.maximum(a, b)
    return v1, v2, apex


def wedges_csr(edges: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(v1, v2, apex): all 2-paths of the degree-oriented graph, generated
    from per-partition CSR blocks."""
    o = _oriented(edges)
    if num_partitions:
        o = o.repartition(num_partitions, "u")
    else:
        o = o.repartition("u")

    def _gen(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        u = pdf["u"].to_numpy(np.int64)
        w = pdf["w"].to_numpy(np.int64)
        uniq, indptr, indices = _csr_from_pairs(u, w)
        v1, v2, apex = _wedges_from_csr(uniq, indptr, indices)
        yield pd.DataFrame({"v1": v1, "v2": v2, "apex": apex})

    return o.mapInPandas(_gen, schema=WEDGE_SCHEMA)


def triangle_count_csr(
    edges: DataFrame,
    num_partitions: int | None = None,
    broadcast_max_edges: int = 64_000_000,
) -> DataFrame:
    """Triangle count via CSR-blocked wedge generation. Same result as
    triangles.triangle_count_df; different physical strategy.

    Closure check, two regimes (the round-7 kron_17 probe made the choice
    measurable — BENCH/triangle_skew.json): the wedge set is ~sum_u
    C(out(u),2), 1.75e9 rows for kron_17's 10.5M edges, so EXPORTING the
    wedges (Arrow transfer + exchange + semi-join) costs more than
    generating them — the relational join path beat the wedge-exporting
    CSR path 247s vs 491s. When the edge set fits a broadcast
    (`broadcast_max_edges`, 64M edges = 512MB packed — far beyond any
    single partition's wedge working set but bounded so a 10^12-edge run
    falls back), the wedges therefore never leave numpy: each task checks
    closure with a vectorized searchsorted against the broadcast sorted
    packed-eid array and emits ONE count per partition — output is
    O(partitions), not O(wedges), and the whole count is wedge-gen +
    log2(m) binary probes, all in-task. Above the gate: the distributed
    semi-join (the only O(wedges) exchange Spark can shuffle-partition,
    i.e. the honest fallback at web scale)."""
    m = edges.count()
    if m <= broadcast_max_edges:
        pdf = edges.select("src", "dst").toPandas()
        s = pdf["src"].to_numpy(np.int64)
        d = pdf["dst"].to_numpy(np.int64)
        packable = len(s) == 0 or (
            s.min() >= 0 and d.min() >= 0 and s.max() < 2**31 and d.max() < 2**32
        )
        if packable:
            spark = edges.sparkSession
            # canonical (src<dst) packed as (src<<32)|dst — one sorted
            # int64 array, shipped once per executor
            eids = np.sort((s << 32) + d)
            bc = spark.sparkContext.broadcast(eids)
            o = _oriented(edges)
            o = (o.repartition(num_partitions, "u") if num_partitions
                 else o.repartition("u"))

            def _count(batches):
                table = bc.value
                total = 0
                pdfs = list(batches)
                if pdfs and len(table):
                    bpdf = (pd.concat(pdfs, ignore_index=True)
                            if len(pdfs) > 1 else pdfs[0])
                    u = bpdf["u"].to_numpy(np.int64)
                    w = bpdf["w"].to_numpy(np.int64)
                    uniq, indptr, indices = _csr_from_pairs(u, w)
                    v1, v2, _ = _wedges_from_csr(uniq, indptr, indices)
                    probe = (v1 << 32) + v2
                    pos = np.searchsorted(table, probe)
                    valid = pos < len(table)
                    total = int((table[pos[valid]] == probe[valid]).sum())
                yield pd.DataFrame({"n": [total]})

            per_part = o.mapInPandas(_count, schema="n long")
            # coalesce: Spark's empty-relation propagation elides the
            # mapInPandas rows for an empty edge set, and sum over zero rows
            # is null — the count must be 0 there (matches triangle_count_df)
            return per_part.agg(
                F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n_triangles")
            )
    w = wedges_csr(edges, num_partitions)
    closing = edges.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    return (
        w.join(closing, ["v1", "v2"], "left_semi")
        .agg(F.count("*").alias("n_triangles"))
    )
