"""Deduplication operators over a documents table (doc_id, text, ...).

Four families, as a 100 TB training-data pipeline needs:

- exact: md5(text) hash groups — one JVM-side groupBy, no Python.
- n-gram Jaccard: character-shingle similarity pairs, entirely in Spark SQL
  expressions (sequence + transform + substring → explode → pair join with
  map-side-combinable counts). The exact method the approximate ones are
  verified against.
- MinHash + LSH: per-doc minhash signatures (vectorized numpy over grouped
  shingles), banded into buckets, candidate pairs from bucket joins, then
  *verified* with exact Jaccard — so output = true pairs, recall whp 1 for
  thresholds well above the band curve's knee.
- SimHash: 64-bit token-vote fingerprints; near-dup pairs = hamming <= k
  within LSH-rotated buckets (here: exact hamming over candidate pairs).

Scale notes: shingle explode is linear in corpus size and column-pruned to
(doc_id, text); the pair join is keyed on shingle/bucket — frequent shingles
are the skew risk, so the Jaccard path drops shingles above a document-
frequency cap (standard practice: a shingle in >50% of docs carries no
signal; the cap bounds join fan-out). All hashing is md5-derived so the
DuckDB oracle can reproduce it exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphzeppelin_spark.sketch.kernel import splitmix64


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_md5, n_docs, canonical_doc_id) — duplicate groups by exact content."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct character n-grams — pure Catalyst expressions."""
    return docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
                    f" i -> substring({text_col}, i, {n}))"
                )
            )
        ).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    df_cap_frac: float = 0.5,
) -> DataFrame:
    """(doc_a, doc_b) pairs with shingle-Jaccard >= threshold (doc_a < doc_b).

    Jaccard computed over the *full* shingle sets; the document-frequency cap
    only prunes which shingles can introduce a candidate pair (a pair sharing
    only ubiquitous shingles has Jaccard ~ 0 anyway at sane thresholds).
    """
    sh = shingles(docs, n=n, text_col=text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    n_docs = docs.count()
    cap = max(2, int(df_cap_frac * n_docs))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= cap)
        .select("shingle")
    )
    sh_r = sh.join(rare, "shingle")
    a = sh_r.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh_r.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            F.col("inter")
            >= F.lit(threshold) * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .select("doc_a", "doc_b")
    )


def _md5_u64(s: str) -> np.uint64:
    return np.uint64(int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16))


_SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("bucket", T.LongType(), False),
    ]
)


def minhash_bands(
    sh: DataFrame, num_hashes: int = 64, bands: int = 16, seed: int = 42
) -> DataFrame:
    """(doc_id, band, bucket) LSH keys from minhash signatures.

    Signature h_i(doc) = min over shingles of splitmix64(md5_64(shingle), seed+i),
    computed vectorized per group; band bucket = splitmix64-combined rows."""
    rows_per_band = num_hashes // bands

    def _sig(key, pdf: pd.DataFrame) -> pd.DataFrame:
        base = np.fromiter(
            (_md5_u64(s) for s in pdf["shingle"]), dtype=np.uint64, count=len(pdf)
        )
        sig = np.empty(num_hashes, dtype=np.uint64)
        for i in range(num_hashes):
            sig[i] = splitmix64(base, seed + i).min()
        buckets = []
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            acc = np.uint64(b)
            for v in chunk:
                acc = splitmix64(np.array([acc ^ v]), seed)[0]
            buckets.append(int(acc.astype(np.int64).view(np.int64)))
        return pd.DataFrame(
            {"doc_id": key[0], "band": np.arange(bands, dtype=np.int32), "bucket": buckets}
        )

    return sh.groupBy("doc_id").applyInPandas(_sig, schema=_SIG_SCHEMA)


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via MinHash LSH candidates, verified by exact Jaccard.

    Output equals ngram_jaccard_pairs whp (the LSH stage only prunes the
    candidate space; every surviving pair is exactly verified)."""
    sh = shingles(docs, n=n, text_col=text_col).persist()
    sig = minhash_bands(sh, num_hashes=num_hashes, bands=bands, seed=seed)
    a = sig.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = sig.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact verification of candidates
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ai = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    bi = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(ai, "doc_a")
        .join(bi, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            F.col("inter")
            >= F.lit(threshold) * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .select("doc_a", "doc_b")
    )
    return out


_SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)


def simhash_signatures(docs: DataFrame, seed: int = 42, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) 64-bit token-vote fingerprints (vectorized per batch)."""

    def _sim(batches):
        for pdf in batches:
            out_ids, out_sig = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = text.split()
                if not toks:
                    out_ids.append(doc_id)
                    out_sig.append(0)
                    continue
                base = np.fromiter(
                    (_md5_u64(t) for t in toks), dtype=np.uint64, count=len(toks)
                )
                h = splitmix64(base, seed)
                bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                    np.int64
                )
                votes = (2 * bits - 1).sum(axis=0)
                sig = np.uint64(0)
                for j in np.nonzero(votes > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(j)
                out_ids.append(doc_id)
                out_sig.append(int(sig.astype(np.int64).view(np.int64)))
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_sig})

    return docs.select("doc_id", text_col).mapInPandas(_sim, schema=_SIMHASH_SCHEMA)


def simhash_dedup_pairs(
    docs: DataFrame, max_hamming: int = 8, seed: int = 42, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b) with simhash hamming distance <= max_hamming.

    Candidates from 4 x 16-bit band buckets (any identical quarter —
    guarantees recall for hamming <= 3 and whp beyond); exact hamming check
    via bit_count on the XOR (JVM-side)."""
    sig = simhash_signatures(docs, seed=seed, text_col=text_col).persist()
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "bucket"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "bucket"
    )
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
        .where(
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= max_hamming
        )
        .select("doc_a", "doc_b")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """(id_a, id_b) embedding pairs with cosine >= threshold — brute-force
    O(n^2) JVM-side (the scale path buckets by LSH first; similarity.py)."""
    e = embeddings.select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
        F.sqrt(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
        ).alias("norm"),
    )
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
            )
            / (F.col("na") * F.col("nb")),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )
