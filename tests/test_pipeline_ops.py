"""Training-data pipeline operators: dedup, similarity, text analysis, multimodal."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphzeppelin_spark.functions.text import text_profile
from graphzeppelin_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup_groups,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
    simhash_signatures,
)
from graphzeppelin_spark.operators.similarity import cosine_topk, lsh_topk


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "a completely different sentence about spark dataframes and shuffles",
        "graph sketches compress edge streams into logarithmic space buckets",
        "pandas udfs move arrow batches between the jvm and python workers",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t))
        rows.append((i + 100, t))  # exact duplicate
        rows.append((i + 200, t[: int(len(t) * 0.8)]))  # near duplicate (prefix)
    rows.append((999, "zzz unrelated singleton document xyz"))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).persist()


def test_exact_dedup(spark, docs):
    groups = exact_dedup_groups(docs).collect()
    dup_groups = [g for g in groups if g["n_docs"] > 1]
    assert len(dup_groups) == 4
    assert all(g["n_docs"] == 2 for g in dup_groups)


def _expected_jaccard_pairs(docs_pdf, threshold, n=3):
    sets = {
        r.doc_id: {r.text[i : i + n] for i in range(max(len(r.text) - n + 1, 1))}
        for r in docs_pdf.itertuples()
    }
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and inter / uni >= threshold:
                out.add((a, b))
    return out


def test_ngram_jaccard_matches_bruteforce(spark, docs):
    pdf = docs.toPandas()
    expected = _expected_jaccard_pairs(pdf, 0.5)
    got = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    assert got == expected
    assert len(got) >= 8  # exact dups + prefix near-dups


def test_ngram_jaccard_hub_shingle_capped(spark):
    """A shingle present in EVERY document (the stopword-hub skew case) must
    not reach the candidate join under the default auto-cap, and capping must
    not lose real near-dup pairs (their doc-specific shingles survive)."""
    rng = np.random.default_rng(11)
    hub = " the common header every page shares "
    rows = [
        (
            i,
            hub
            + " ".join(
                "".join(rng.choice(list("abcdefghijklmnop"), size=8)) for _ in range(40)
            ),
        )
        for i in range(240)
    ]
    rows.append((9000, rows[7][1]))  # exact duplicate of doc 7 → a true pair
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    capped = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, 0.6).collect()}
    uncapped = {
        (r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, 0.6, df_cap=None).collect()
    }
    assert capped == uncapped
    assert (7, 9000) in capped
    # the hub shingles (df = 241 > max(0.5*241, 100)) are pruned from the
    # candidate explode: candidate volume stays linear, not quadratic
    from graphzeppelin_spark.operators.dedup import shingles

    sh = shingles(docs)
    dfreq = sh.groupBy("shingle").count()
    n_hub = dfreq.where(F.col("count") > 121).count()
    assert n_hub > 0  # the skew actually exists in this corpus


def test_minhash_equals_exact_pairs(spark, docs):
    exact = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    mh = {(r.doc_a, r.doc_b) for r in minhash_dedup_pairs(docs, 0.5).collect()}
    assert mh == exact  # verified candidates; whp-1 recall at this threshold


def test_simhash_exact_dups_zero_distance(spark, docs):
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    for i in range(4):
        assert sigs[i] == sigs[i + 100]
    pairs = {(r.doc_a, r.doc_b) for r in simhash_dedup_pairs(docs, max_hamming=8).collect()}
    for i in range(4):
        assert (i, i + 100) in pairs
    assert (0, 1) not in pairs  # unrelated docs stay apart


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16))
    rows = []
    for i in range(40):
        rows.append((i, base[i].astype(np.float32).tolist()))
        if i < 5:  # near-duplicates of the first five
            rows.append((i + 100, (base[i] + 0.01 * rng.standard_normal(16)).astype(np.float32).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()


def test_embedding_neardup(spark, embeddings):
    pairs = {(r.id_a, r.id_b) for r in embedding_neardup_pairs(embeddings, 0.99).collect()}
    assert pairs == {(i, i + 100) for i in range(5)}


def test_cosine_topk_vs_numpy(spark, embeddings):
    pdf = embeddings.toPandas()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    queries = embeddings.where(F.col("vec_id") < 3)
    got = cosine_topk(embeddings, queries, k=3).toPandas()
    for qid in range(3):
        q = vecs[qid]
        scores = {
            vid: float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            for vid, v in vecs.items()
            if vid != qid
        }
        expected = sorted(scores, key=lambda v: (-round(scores[v], 4), v))[:3]
        got_n = got[got.query_id == qid].sort_values(
            ["score", "neighbor_id"], ascending=[False, True]
        )["neighbor_id"].tolist()
        assert got_n == expected
        assert got_n[0] == qid + 100  # the planted near-duplicate ranks first


def test_ivf_topk_finds_planted_neighbor(spark, embeddings):
    from graphzeppelin_spark.operators.similarity import ivf_topk

    queries = embeddings.where(F.col("vec_id") < 3)
    got = ivf_topk(embeddings, queries, k=3, n_centroids=8, nprobe=3).toPandas()
    for qid in range(3):
        rows = got[got.query_id == qid]
        assert (qid + 100) in set(rows["neighbor_id"])  # 0.99-cosine dup recalled


def test_lsh_topk_finds_planted_neighbor(spark, embeddings):
    queries = embeddings.where(F.col("vec_id") < 3)
    got = lsh_topk(embeddings, queries, k=3, num_tables=12).toPandas()
    for qid in range(3):
        rows = got[got.query_id == qid]
        # the 0.99-cosine planted duplicate must be recalled by LSH
        assert (qid + 100) in set(rows["neighbor_id"])


def test_text_profile(spark, docs):
    prof = text_profile(docs).toPandas().set_index("doc_id")
    r = prof.loc[0]
    assert r["n_tokens"] == 13
    assert r["n_subword_tokens"] >= r["n_tokens"]
    assert 0 <= r["quality"] <= 1
    assert r["lang_pred"] == "en"
    # fingerprint equals for exact duplicate
    assert prof.loc[0, "fingerprint"] == prof.loc[100, "fingerprint"]
    assert prof.loc[999, "punct_ratio"] == 0.0


def test_winnowing_large_matches_reference_and_guarantee(spark):
    """The numpy scale path must (a) equal a brute-force per-doc reference of
    the same definition and (b) uphold the winnowing guarantee: documents
    sharing a substring of length >= w + k - 1 share a fingerprint."""
    from graphzeppelin_spark.functions.text import winnowing_fingerprints_large
    from graphzeppelin_spark.sketch.kernel import splitmix64

    k, w = 5, 4
    shared = "the quick brown fox jumps over the lazy dog"
    docs_rows = [
        (0, f"alpha beta {shared} gamma delta"),
        (1, f"unrelated prefix text here {shared}"),
        (2, "zzz completely different content qqq xyz abcdefgh"),
        (3, ""),
    ]
    docs = spark.createDataFrame(pd.DataFrame(docs_rows, columns=["doc_id", "text"]))
    got = winnowing_fingerprints_large(docs, k=k, w=w).toPandas()
    by_doc = {d: set(g["fp"]) for d, g in got.groupby("doc_id")}

    def ref_fps(text):
        import re

        norm = re.sub(r"\s+", " ", text.strip().lower())
        b = norm.encode("utf-8")
        b = b + b"\x00" * max(k - len(b), 0)
        hs = []
        for i in range(len(b) - k + 1):
            h = np.uint64(0)
            with np.errstate(over="ignore"):
                for ch in b[i : i + k]:
                    h = h * np.uint64(257) + np.uint64(ch)
            hs.append(int(splitmix64(np.array([h], np.uint64), 0)[0]))
        mins = [min(hs[i : i + w]) for i in range(max(len(hs) - w + 1, 1))]
        return {int(np.int64(np.uint64(m))) for m in mins}

    for d, text in docs_rows:
        assert by_doc.get(d, set()) == ref_fps(text), f"doc {d} mismatch"
    # guarantee: 0 and 1 share the long substring -> common fingerprints
    assert by_doc[0] & by_doc[1]
    # unrelated docs share nothing at this size
    assert not (by_doc[0] & by_doc[2])


def test_embedding_neardup_lsh_equals_bruteforce(spark, embeddings):
    """The bucketed scale path must return exactly the brute-force pairs at
    a near-dup threshold (candidates are exact-verified; LSH only prunes)."""
    bf = {(r.id_a, r.id_b) for r in
          embedding_neardup_pairs(embeddings, 0.99, brute_force=True).collect()}
    lsh = {(r.id_a, r.id_b) for r in
           embedding_neardup_pairs(embeddings, 0.99, num_tables=12, num_planes=6).collect()}
    assert lsh == bf


def test_ann_recall_at_k(spark, embeddings):
    from graphzeppelin_spark.operators.similarity import ann_recall_at_k, ivf_topk

    queries = embeddings.where(F.col("vec_id") < 3)
    ann = ivf_topk(embeddings, queries, k=3, n_centroids=8, nprobe=8)
    rec = ann_recall_at_k(embeddings, queries, ann, k=3).toPandas()
    assert len(rec) == 3
    # probing every list == exact search: full recall by construction
    assert (rec["recall"] == 1.0).all()
    assert (rec["hits"] == 3).all()


def test_ivf_centroids_trained_distributed(spark, embeddings):
    """Centroids must be unit-norm and actually move toward the data (the
    recenter step runs in the JVM; the driver only ever sees n_centroids rows)."""
    from graphzeppelin_spark.operators.similarity import ivf_train_centroids

    cent = ivf_train_centroids(embeddings, n_centroids=4, kmeans_iters=3)
    assert cent.shape == (4, 16)
    np.testing.assert_allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-9)
    # assignment should split the corpus across several lists
    pdf = embeddings.toPandas()
    x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    assign = np.argmax(x @ cent.T, axis=1)
    assert len(np.unique(assign)) >= 3


def test_winnowing_shared_substring_detection(spark, docs):
    """Winnowing guarantee: exact duplicates share ALL fingerprints; docs
    sharing a long substring (the 80% prefix mutations) share many; unrelated
    docs share ~none."""
    from graphzeppelin_spark.functions.text import winnowing_fingerprints

    out = winnowing_fingerprints(docs).toPandas()
    fps = {d: set(g["fp"]) for d, g in out.groupby("doc_id")}
    for i in range(4):
        assert fps[i] == fps[i + 100]          # exact dup
        shared = len(fps[i] & fps[i + 200])    # prefix near-dup
        assert shared >= max(2, len(fps[i + 200]) // 2)
    assert len(fps[0] & fps[999]) == 0         # unrelated


def test_ivf_persisted_index_search(spark, embeddings, tmp_path):
    """Build-once/search-many: the persisted IVF index must (a) return the
    exact top-k when every list is probed, (b) bound IO via partition
    pruning on the centroid-partitioned lists (the probe join prunes the
    scan), and (c) survive a fresh read (no driver state)."""
    from graphzeppelin_spark.operators.similarity import (
        cosine_topk,
        ivf_read_centroids,
        ivf_search,
        ivf_write_index,
    )

    path = str(tmp_path / "ivf_idx")
    cent = ivf_write_index(embeddings, path, n_centroids=4, kmeans_iters=3)
    assert ivf_read_centroids(spark, path).shape == cent.shape
    queries = embeddings.where(F.col("vec_id") < 3)
    # probing EVERY list == exact search
    got = ivf_search(queries, path, k=3, nprobe=4).toPandas()
    exact = cosine_topk(embeddings, queries, k=3).toPandas()
    key = ["query_id", "neighbor_id", "score"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, ignore_index=True)[key],
        exact.sort_values(key, ignore_index=True)[key],
    )
    # the on-disk layout is the index: lists are partitioned by centroid
    import os

    parts = [d for d in os.listdir(f"{path}/lists") if d.startswith("centroid=")]
    assert len(parts) == 4
    # and the probe join reaches the scan as a partition filter
    plan = ivf_search(queries, path, k=3, nprobe=1)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
