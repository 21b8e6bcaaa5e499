"""Deduplication operators over a documents table (doc_id, text, ...).

Four families, as a 100 TB training-data pipeline needs:

- exact: md5(text) hash groups — one JVM-side groupBy, no Python.
- n-gram Jaccard: character-shingle similarity pairs, entirely in Spark SQL
  expressions (sequence + transform + substring → explode → pair join with
  map-side-combinable counts). The exact method the approximate ones are
  verified against.
- MinHash + LSH: shingles hashed JVM-side (xxhash64) so Python only ever
  sees int64 columns; per-doc minhash signatures are a vectorized numpy
  min-scatter per partition, banded into buckets, candidate pairs from
  bucket joins, then *verified* with exact Jaccard — so output = true pairs,
  recall whp 1 for thresholds well above the band curve's knee.
- SimHash: 48-bit token-vote fingerprints computed 100% in Catalyst from
  md5-derived token hashes with pure-arithmetic bit extraction — an
  independent SQL engine reproduces the signatures bit-for-bit (the oracle
  contract); near-dup pairs = hamming <= k within banded buckets.

Scale notes: shingle explode is linear in corpus size and column-pruned to
(doc_id, text); the pair joins are keyed on shingle/bucket — frequent
shingles are the skew risk, so candidate generation can drop shingles above
a document-frequency cap (a shingle in >50% of docs carries no signal; the
cap bounds join fan-out) while Jaccard itself is always computed over the
FULL shingle sets of the surviving candidate pairs.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphzeppelin_spark.sketch.kernel import splitmix64

SIMHASH_BITS = 48  # fits signed 64-bit in both engines; 4 x 12-bit bands


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


def _verified_jaccard_pairs(
    cands: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard over the FULL shingle sets for candidate (doc_a, doc_b)
    pairs; returns the pairs meeting the threshold."""
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
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            F.col("inter")
            >= F.lit(threshold) * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .select("doc_a", "doc_b")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    df_cap: int | str | None = "auto",
) -> DataFrame:
    """(doc_a, doc_b) pairs with shingle-Jaccard >= threshold (doc_a < doc_b).

    Candidate pairs come from co-occurring shingles, restricted to shingles
    in <= df_cap documents (skew bound ON by default: the candidate join is
    quadratic in the document frequency of the hottest shingle, so one
    stopword shingle would otherwise melt a reducer at corpus scale; a
    shingle in most documents carries no signal at sane thresholds anyway).
    df_cap="auto" caps at max(0.5 * n_docs, 100), computed inside the plan
    (broadcast one-row count — no action at plan-construction time);
    df_cap=None disables the bound (exact candidate generation, test-scale
    only). The Jaccard test then recounts the intersection over the FULL
    shingle sets, so the cap can only lose candidate pairs whose EVERY common
    shingle is ubiquitous, never misscore a surviving pair."""
    sh = shingles(docs, n=n, text_col=text_col)
    sh_c = sh
    if df_cap is not None:
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        if df_cap == "auto":
            ndocs = docs.select(F.count_distinct("doc_id").alias("n_docs"))
            rare = (
                dfreq.crossJoin(F.broadcast(ndocs))
                .where(
                    F.col("df")
                    <= F.greatest(F.ceil(F.col("n_docs") * 0.5), F.lit(100))
                )
                .select("shingle")
            )
        else:
            rare = dfreq.where(F.col("df") <= df_cap).select("shingle")
        sh_c = sh.join(rare, "shingle")
    a = sh_c.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh_c.select(F.col("doc_id").alias("doc_b"), "shingle")
    cands = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verified_jaccard_pairs(cands, sh, threshold)


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

    Shingle hashing happens in the JVM (xxhash64) — Python receives only
    (doc_id, h) int64 columns and does pure-numeric work: signature
    h_i(doc) = min over shingles of splitmix64(h, seed+i) via one vectorized
    min-scatter per hash function, then band buckets by chained splitmix64.
    One repartition(doc_id) co-locates each doc's shingle hashes; all docs in
    a partition are processed in one numpy pass (no per-doc groups)."""
    rows_per_band = num_hashes // bands
    hashed = sh.select(
        "doc_id", F.xxhash64("shingle", F.lit(seed)).alias("h")
    ).repartition("doc_id")

    def _sig(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        docs = pdf["doc_id"].to_numpy(np.int64)
        base = pdf["h"].to_numpy(np.int64).view(np.uint64)
        # sort once, then one contiguous segmented min per hash function:
        # np.minimum.at's indexed scatter is ~20-50x slower than reduceat
        # over presorted segments, and this loop ran 128 times per batch
        # (it was most of dedup_minhash's python time)
        order = np.argsort(docs, kind="stable")
        base_s = base[order]
        uniq, starts = np.unique(docs[order], return_index=True)
        sig = np.empty((len(uniq), num_hashes), dtype=np.uint64)
        for i in range(num_hashes):
            hv = splitmix64(base_s, seed + i)
            sig[:, i] = np.minimum.reduceat(hv, starts)
        out_b = np.empty((len(uniq), bands), dtype=np.int64)
        for b in range(bands):
            acc = np.full(len(uniq), np.uint64(b))
            for r in range(rows_per_band):
                acc = splitmix64(acc ^ sig[:, b * rows_per_band + r], seed)
            out_b[:, b] = acc.view(np.int64)
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(uniq, bands),
                "band": np.tile(np.arange(bands, dtype=np.int32), len(uniq)),
                "bucket": out_b.reshape(-1),
            }
        )

    return hashed.mapInPandas(_sig, schema=_SIG_SCHEMA)


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
    return _verified_jaccard_pairs(cands, sh, threshold)


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) 48-bit token-vote fingerprints, 100% Catalyst.

    Token hash = first 15 hex chars of md5(token) as an integer (60 bits,
    safely inside a signed long); bit j extracted arithmetically as
    (h div 2^j) % 2 — every step is reproducible verbatim in an independent
    SQL engine (see the dedup_simhash oracle), which is the point: the
    signature itself is the verified artifact, not just row counts. Empty
    documents get signature 0."""
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
        )
    )
    aggs = [
        F.sum(F.expr(f"2 * ((h div {1 << j}) % 2) - 1")).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = toks.groupBy("doc_id").agg(*aggs)
    sig = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)),
        range(SIMHASH_BITS),
        F.lit(0).cast("long"),
    )
    signed = votes.select("doc_id", sig.cast("long").alias("simhash"))
    return (
        docs.select("doc_id")
        .join(signed, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0)).cast("long").alias("simhash"))
    )


def simhash_dedup_pairs(
    docs: DataFrame, max_hamming: int = 6, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b) with simhash hamming distance <= max_hamming.

    Candidates from 4 x 12-bit band buckets (any identical quarter —
    guarantees recall for hamming <= 3 and whp beyond); exact hamming check
    via bit_count on the XOR (JVM-side)."""
    sig = simhash_signatures(docs, text_col=text_col).persist()
    band_width = SIMHASH_BITS // 4
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", band_width * i)
                        .bitwiseAND(F.lit((1 << band_width) - 1))
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
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_tables: int = 8,
    num_planes: int | None = 8,
    seed: int = 42,
    brute_force: bool = False,
) -> DataFrame:
    """(id_a, id_b) embedding pairs with cosine >= threshold.

    Default is the scale path: candidates share a random-hyperplane LSH
    bucket in any of `num_tables` tables (bounded join fan-out), then the
    exact cosine filter runs on the candidate pairs only. Recall: a pair at
    cosine c collides in one table w.p. (1 - acos(c)/pi)^num_planes; at
    c >= 0.95 and 8 planes that is >= 0.83, so >= 1 - (1-0.83)^8 ~ 1 - 6e-7
    over 8 tables. brute_force=True keeps the O(n^2) crossJoin for small
    inputs / verification."""
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
    if brute_force:
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        from graphzeppelin_spark.operators.similarity import (
            auto_num_planes,
            lsh_buckets,
        )

        if num_planes is None:
            # occupancy-aware plane count (round-7 scale probe: fixed 8
            # planes -> 90x candidate growth at a 10x corpus; see
            # auto_num_planes). Recall per table falls as planes grow, so
            # pair this with more tables at very high plane counts if the
            # threshold is below ~0.95.
            num_planes = auto_num_planes(embeddings.count())
        bk = lsh_buckets(embeddings, num_tables=num_tables, num_planes=num_planes, seed=seed)
        ca = bk.select(F.col("vec_id").alias("id_a"), "table", "bucket")
        cb = bk.select(F.col("vec_id").alias("id_b"), "table", "bucket")
        cands = (
            ca.join(cb, ["table", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        pairs = cands.join(a, "id_a").join(b, "id_b")
    return (
        pairs.withColumn(
            "cos",
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
            )
            / (F.col("na") * F.col("nb")),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )
