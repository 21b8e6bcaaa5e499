"""Dedup/ANN bucketing scale probe (round-6 verdict next-round #6).

The dedup/ANN operators are oracle-gated at sf0.1 (500-5,000 docs) but their
100TB story rests on BUCKETED candidate generation — LSH bands, simhash
quarters, IVF lists — whose behavior (candidate-pair growth, band fan-out)
is only observable on a corpus large enough for buckets to matter. This
probe synthesizes deterministic corpora at 3 sizes with FIXED near-dup
density (3-doc groups: 1 original + 2 perturbed replicas; dup-group size
deliberately does not grow with corpus size, so a healthy bucketed design
shows ~linear candidate growth — quadratic growth would mean bucket
saturation) and records:

- minhash-LSH: band-bucket join fan-out (sum over buckets of c*(c-1)/2),
  verified-pair count, wall time;
- simhash: quarter-band fan-out, pair count, wall time;
- embedding LSH (neardup) and IVF (topk): candidate counts, wall time, and
  the recall@1 gate vs exact brute-force top-k on a query sample.

Writes BENCH/dedup_scale.json. Corpus sizes via SPARK_GRAFT_DS_SIZES
(default "5000,25000,50000" docs; embeddings scale with docs/2.5).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

VOCAB = 50_000
DOC_TOKENS = 60
GROUP = 3  # docs per near-dup group (1 original + 2 replicas)
PERTURB = 0.10  # token replacement rate for replicas
EMB_DIM = 64
JACCARD_T = 0.5
SIZES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_DS_SIZES", "5000,25000,50000").split(",")]


def make_docs(n_docs: int, seed: int = 7) -> pd.DataFrame:
    """n_docs documents in GROUP-sized near-dup groups, deterministic.

    Words are random 8-LETTER strings, not numbered tokens: the dedup
    shingles are character 3-grams, and a digit-heavy vocabulary ("w00123")
    collapses the shingle alphabet to ~1.3k trigrams, giving RANDOM doc
    pairs Jaccard ~0.25 and a quadratic band-collision blowup that says
    nothing about the operator (the first probe run measured exactly that
    and filled the disk at 50k docs). Alphabetic words give a diverse
    trigram space, so candidate growth reflects the planted dup structure."""
    rng = np.random.default_rng(seed)
    letters = rng.integers(0, 26, size=(VOCAB, 8))
    vocab = np.array(
        ["".join(chr(97 + c) for c in row) for row in letters])
    n_orig = n_docs // GROUP
    base = rng.integers(0, VOCAB, size=(n_orig, DOC_TOKENS))
    rows_id, rows_tx = [], []
    for rep in range(GROUP):
        toks = base.copy()
        if rep > 0:
            mask = rng.random(base.shape) < PERTURB
            toks[mask] = rng.integers(0, VOCAB, size=int(mask.sum()))
        ids = np.arange(n_orig, dtype=np.int64) * GROUP + rep
        rows_id.append(ids)
        rows_tx.append(toks)
    ids = np.concatenate(rows_id)
    toks = np.vstack(rows_tx)
    texts = [" ".join(vocab[t] for t in row) for row in toks]
    return pd.DataFrame({"doc_id": ids, "text": texts})


def make_embeddings(n_vec: int, seed: int = 11) -> pd.DataFrame:
    """n_vec unit vectors in near-dup pairs (1 original + 1 jittered)."""
    rng = np.random.default_rng(seed)
    n_orig = n_vec // 2
    base = rng.standard_normal((n_orig, EMB_DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    jit = base + 0.05 * rng.standard_normal((n_orig, EMB_DIM))
    jit /= np.linalg.norm(jit, axis=1, keepdims=True)
    vecs = np.vstack([base, jit]).astype(np.float32)
    ids = np.concatenate([np.arange(n_orig, dtype=np.int64) * 2,
                          np.arange(n_orig, dtype=np.int64) * 2 + 1])
    return pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})


def bucket_fanout(df, keys) -> int:
    """Join fan-out of self-joining df on `keys`: sum over groups of
    c*(c-1)/2 — computed as an aggregate, never materializing the pairs."""
    return int(
        df.groupBy(*keys).count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p"))
        .collect()[0]["p"] or 0
    )


def main() -> None:
    from graphzeppelin_spark import get_spark
    from graphzeppelin_spark.operators.dedup import (
        embedding_neardup_pairs,
        minhash_bands,
        minhash_dedup_pairs,
        shingles,
        simhash_dedup_pairs,
        simhash_signatures,
    )
    from graphzeppelin_spark.operators.similarity import (
        _ivf_assign,
        ann_recall_at_k,
        ivf_topk,
        ivf_train_centroids,
        lsh_buckets,
    )

    spark = get_spark(app_name="gz_dedup_scale", cores=32,
                      shuffle_partitions=64)
    out: dict = {"sizes": [], "group_size": GROUP, "perturb_rate": PERTURB}

    for n_docs in SIZES:
        entry: dict = {"n_docs": n_docs}
        docs = spark.createDataFrame(make_docs(n_docs)).repartition(32).persist()
        docs.count()

        # ---- minhash LSH ----
        sh = shingles(docs).persist()
        sig = minhash_bands(sh).persist()
        entry["minhash_band_fanout_pairs"] = bucket_fanout(
            sig, ["band", "bucket"])
        t0 = time.time()
        entry["minhash_verified_pairs"] = minhash_dedup_pairs(
            docs, threshold=JACCARD_T).count()
        entry["minhash_full_sec"] = round(time.time() - t0, 2)
        sig.unpersist(); sh.unpersist()

        # ---- simhash ----
        ssig = simhash_signatures(docs).persist()
        band_width = 48 // 4
        sbands = ssig.select(
            "doc_id",
            F.explode(F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("simhash", band_width * i)
                    .bitwiseAND(F.lit((1 << band_width) - 1)).alias("bucket"),
                ) for i in range(4)
            ])).alias("bb"),
        ).select("doc_id", "bb.band", "bb.bucket")
        entry["simhash_band_fanout_pairs"] = bucket_fanout(
            sbands, ["band", "bucket"])
        t0 = time.time()
        entry["simhash_pairs"] = simhash_dedup_pairs(docs).count()
        entry["simhash_full_sec"] = round(time.time() - t0, 2)
        ssig.unpersist()
        docs.unpersist()

        # ---- embeddings: LSH neardup + IVF topk ----
        n_vec = int(n_docs / 2.5)
        emb = spark.createDataFrame(make_embeddings(n_vec)).repartition(32).persist()
        emb.count()
        entry["n_vectors"] = n_vec
        bk = lsh_buckets(emb).persist()
        entry["emb_lsh_fanout_pairs"] = bucket_fanout(bk, ["table", "bucket"])
        bk.unpersist()
        # occupancy-aware plane count (auto_num_planes): the linear-growth
        # counterpart to the fixed-8-plane fan-out above
        from graphzeppelin_spark.operators.similarity import auto_num_planes

        planes_auto = auto_num_planes(n_vec)
        entry["emb_lsh_auto_planes"] = planes_auto
        bka = lsh_buckets(emb, num_planes=planes_auto).persist()
        entry["emb_lsh_auto_fanout_pairs"] = bucket_fanout(
            bka, ["table", "bucket"])
        bka.unpersist()
        t0 = time.time()
        entry["emb_lsh_neardup_pairs"] = embedding_neardup_pairs(
            emb, threshold=0.95, num_planes=None).count()
        entry["emb_lsh_full_sec"] = round(time.time() - t0, 2)

        # IVF candidate fan-out: probes(4) x corpus lists joined on centroid
        n_cent = 16 if n_vec <= 2000 else 64
        cent = ivf_train_centroids(emb, n_centroids=n_cent)
        corpus_c = (_ivf_assign(emb, cent, 1, "neighbor_id")
                    .groupBy("centroid").count()
                    .withColumnRenamed("count", "nc"))
        queries = emb.where(F.col("vec_id") % 50 == 0).persist()
        n_q = queries.count()
        entry["n_queries"] = n_q
        probe_c = (_ivf_assign(queries, cent, 4, "query_id")
                   .groupBy("centroid").count()
                   .withColumnRenamed("count", "nq"))
        entry["ivf_candidate_pairs"] = int(
            corpus_c.join(probe_c, "centroid")
            .agg(F.sum(F.col("nc") * F.col("nq"))).collect()[0][0] or 0)
        entry["ivf_n_centroids"] = n_cent
        t0 = time.time()
        ivf = ivf_topk(emb, queries, k=1, n_centroids=n_cent, nprobe=4)
        rec = ann_recall_at_k(emb, queries, ivf, k=1)
        entry["ivf_recall_at_1"] = round(
            float(rec.agg(F.avg("recall")).collect()[0][0]), 4)
        entry["ivf_topk_sec"] = round(time.time() - t0, 2)
        queries.unpersist(); emb.unpersist()

        out["sizes"].append(entry)
        print(json.dumps(entry), file=sys.stderr, flush=True)

    # growth factors vs the smallest size (healthy = ~size ratio, not ^2)
    s0 = out["sizes"][0]
    for e in out["sizes"][1:]:
        r = e["n_docs"] / s0["n_docs"]
        e["size_ratio"] = r
        for k in ("minhash_band_fanout_pairs", "simhash_band_fanout_pairs",
                  "emb_lsh_fanout_pairs", "emb_lsh_auto_fanout_pairs",
                  "ivf_candidate_pairs"):
            if s0.get(k):
                e[f"{k}_growth"] = round(e[k] / s0[k], 2)
    with open(os.path.join(REPO, "BENCH", "dedup_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["sizes"][-1]))


if __name__ == "__main__":
    main()
