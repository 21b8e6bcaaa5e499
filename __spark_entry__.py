"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises an operator family from SURVEY.md §2 on the
driver-generated tables; ``oracle_sql()`` gives the DuckDB-runnable ANSI SQL
twin. Graph queries run on deterministic graphs *derived in SQL-expressible
ways* from the TPC-H-ish tables (chains from customer keys, circulants from
part keys), so an independent engine can verify CC / PageRank / label
propagation / triangles exactly. Pipeline queries (dedup / similarity / text)
run on the documents and embeddings tables.

Engine-native fixtures (kron streams, dynamic Erdős–Rényi, the pages table)
are exercised by the pytest suite instead — see tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHAIN_MOD = 32  # customer-key chain length
CIRC_MOD = 200  # circulant graph size for triangle queries
PR_ITERS = 12  # unrolled PageRank iterations (engine and oracle in lockstep)
PR_DAMP = 0.85
LP_MODE_ITERS = 6  # unrolled mode-rule label-prop supersteps (engine + oracle)
JACCARD_T = 0.6
DOC_LIMIT = 150  # doc subset for the quadratic jaccard oracles
COS_T = 0.478  # sits in a wide gap of the sf0.01 cosine distribution


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------- graphs


def _chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected chains over customer keys: (v-1, v) unless v%32==0."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_custkey") % CHAIN_MOD != 0)
        .select(
            (F.col("c_custkey") - 1).alias("src"),
            F.col("c_custkey").alias("dst"),
        )
    )


def _chain_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("v"))


def _circulant_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C_m{1,2} circulant on part keys mod m — exactly m triangles."""
    verts = (
        _t(spark, sf_dir, "part")
        .select((F.col("p_partkey") % CIRC_MOD).alias("v"))
        .distinct()
    )
    e1 = verts.select("v", ((F.col("v") + 1) % CIRC_MOD).alias("w"))
    e2 = verts.select("v", ((F.col("v") + 2) % CIRC_MOD).alias("w"))
    return (
        e1.unionAll(e2)
        .select(F.least("v", "w").alias("src"), F.greatest("v", "w").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def q_cc_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.operators.connectivity import connected_components_df

    return connected_components_df(
        _chain_edges(spark, sf_dir), vertices=_chain_vertices(spark, sf_dir)
    )


def q_cc_sketch_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.operators.sketch_cc import SketchCC

    edges = _chain_edges(spark, sf_dir)
    n = edges.agg(F.max("dst")).collect()[0][0] + 1
    stream = edges.select(
        F.monotonically_increasing_id().alias("seq"),
        F.lit(0).alias("type"),
        "src",
        "dst",
    )
    alg = SketchCC(spark, num_vertices=int(n), seed=42)
    state = alg.build_state(stream)
    return alg.connected_components(state)


def q_cc_distributed_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrame-resident-labels CC path (sketch_cc.py
    connected_components_distributed — the 10^9-vertex regime) under the
    same chain oracle as cc_chain: every chain vertex carries an edge, so
    the state covers the full vertex set and the labelings must agree
    exactly."""
    from graphzeppelin_spark.operators.sketch_cc import SketchCC

    edges = _chain_edges(spark, sf_dir)
    n = edges.agg(F.max("dst")).collect()[0][0] + 1
    stream = edges.select(
        F.monotonically_increasing_id().alias("seq"),
        F.lit(0).alias("type"),
        "src",
        "dst",
    )
    alg = SketchCC(spark, num_vertices=int(n), seed=42)
    state = alg.build_state(stream)
    out = alg.connected_components_distributed(state).select(
        F.col("vertex").alias("v"), "component"
    )
    # contract scope: the oracle labels customer vertices; the distributed
    # path labels STATE vertices (which also include chain vertex 0)
    return out.join(_chain_vertices(spark, sf_dir), "v")


def q_labelprop_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.operators.labelprop import label_propagation_df

    out = label_propagation_df(
        _chain_edges(spark, sf_dir),
        vertices=_chain_vertices(spark, sf_dir),
        max_iters=60,
    )
    return out.select("v", F.col("label").alias("component"))


def q_labelprop_mode_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rule="mode" label propagation (most-frequent neighbor label, ties to
    the smallest label) — the community-detection variant. Mode LP has no
    early fixpoint on the chain graph within 6 supersteps, so engine and
    oracle both run exactly LP_MODE_ITERS synchronous supersteps; the
    deterministic tie-break makes a DuckDB twin writable (round-6 verdict
    next-round #8)."""
    from graphzeppelin_spark.operators.labelprop import label_propagation_df

    out = label_propagation_df(
        _chain_edges(spark, sf_dir),
        vertices=_chain_vertices(spark, sf_dir),
        max_iters=LP_MODE_ITERS,
        rule="mode",
    )
    return out.select("v", F.col("label").alias("component"))


def q_pagerank_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.functions.text import round_portable
    from graphzeppelin_spark.operators.pagerank import pagerank_df

    out = pagerank_df(
        _chain_edges(spark, sf_dir),
        vertices=_chain_vertices(spark, sf_dir),
        damping=PR_DAMP,
        num_iters=PR_ITERS,
    )
    return out.select("v", round_portable(F.col("score"), 9).alias("score"))


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.operators.triangles import triangle_count_df

    return triangle_count_df(_circulant_edges(spark, sf_dir))


def q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.operators.triangles import triangles_per_vertex_df

    return triangles_per_vertex_df(_circulant_edges(spark, sf_dir))


def q_triangle_count_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as triangle_count_circulant via the CSR-blocked path."""
    from graphzeppelin_spark.operators.adjacency import triangle_count_csr

    return triangle_count_csr(_circulant_edges(spark, sf_dir))


def q_component_sets_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference get_component_sets (return_types.cpp:23-30): component →
    sorted member list, via the sketch path; members joined to a string so
    the value hash is engine-portable."""
    from graphzeppelin_spark.operators.sketch_cc import SketchCC

    edges = _chain_edges(spark, sf_dir)
    n = edges.agg(F.max("dst")).collect()[0][0] + 1
    stream = edges.select(
        F.monotonically_increasing_id().alias("seq"), F.lit(0).alias("type"), "src", "dst"
    )
    alg = SketchCC(spark, num_vertices=int(n), seed=42)
    sets = alg.component_sets(alg.build_state(stream))
    return sets.select(
        "component",
        F.array_join(
            F.transform("members", lambda x: x.cast("string")), ","
        ).alias("members"),
    )


def q_point_queries_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference point_query (cc_sketch_alg.cpp:570-612): connectivity of
    chosen vertex pairs — (31,32) crosses a chain boundary, the others
    don't."""
    from graphzeppelin_spark.operators.sketch_cc import SketchCC

    edges = _chain_edges(spark, sf_dir)
    n = edges.agg(F.max("dst")).collect()[0][0] + 1
    stream = edges.select(
        F.monotonically_increasing_id().alias("seq"), F.lit(0).alias("type"), "src", "dst"
    )
    alg = SketchCC(spark, num_vertices=int(n), seed=42)
    labels, _ = alg.boruvka(alg.build_state(stream))
    import pandas as pd

    pairs = [(1, 2), (31, 32), (32, 33), (33, 40)]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "a": [a for a, _ in pairs],
                "b": [b for _, b in pairs],
                "connected": [bool(labels[a] == labels[b]) for a, b in pairs],
            }
        )
    )


def q_k_spanning_forests_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference KSPANNINGFORESTS query (cc_sketch_alg.h:60-63): peel 2
    edge-disjoint forests. Chains ARE forests, so forest 0 = every chain
    edge and forest 1 is empty — exactly SQL-predictable."""
    from graphzeppelin_spark.operators.sketch_cc import SketchCC

    edges = _chain_edges(spark, sf_dir)
    n = edges.agg(F.max("dst")).collect()[0][0] + 1
    stream = edges.select(
        F.monotonically_increasing_id().alias("seq"), F.lit(0).alias("type"), "src", "dst"
    )
    alg = SketchCC(spark, num_vertices=int(n), seed=42)
    forests = alg.k_spanning_forests(alg.build_state(stream), k=2)
    import pandas as pd

    rows = []
    for k, f in enumerate(forests):
        for s, d in f:
            rows.append((k, int(min(s, d)), int(max(s, d))))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "src", "dst"]),
        schema="k int, src long, dst long",
    )


def q_spanning_forest_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chains have a unique spanning forest (= every chain edge), so the
    sketch path's forest is exactly comparable."""
    from graphzeppelin_spark.operators.sketch_cc import SketchCC

    edges = _chain_edges(spark, sf_dir)
    n = edges.agg(F.max("dst")).collect()[0][0] + 1
    stream = edges.select(
        F.monotonically_increasing_id().alias("seq"), F.lit(0).alias("type"), "src", "dst"
    )
    alg = SketchCC(spark, num_vertices=int(n), seed=42)
    return alg.spanning_forest(alg.build_state(stream))


def q_degrees_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree table via the explicit two-stage skew-salted aggregation."""
    from graphzeppelin_spark.functions.skew import salted_degrees

    return salted_degrees(_chain_edges(spark, sf_dir)).select(
        "v", F.col("degree").cast("long").alias("degree")
    )


def q_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toggle-stream semantics on the events table: live (user, event_type)
    pairs = seen an odd number of times (the reference's stream model)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .count()
        .where(F.col("count") % 2 == 1)
        .select("user_id", "event_type")
    )


# ------------------------------------------------------------------- pipeline


def _augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents (doc_id < DOC_LIMIT) plus deterministic 80%-prefix mutations
    at doc_id+10000 — plants real near-duplicates for the jaccard queries."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < DOC_LIMIT)
    mut = d.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.expr("substring(text, 1, cast(floor(length(text) * 0.8) as int))").alias(
            "text"
        ),
    )
    return d.select("doc_id", "text").unionAll(mut)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.operators.dedup import ngram_jaccard_pairs

    # df_cap=None: the DuckDB twin is exact/uncapped, so the contract must
    # run the exact path too (the production "auto" cap can drop pairs whose
    # every common shingle is ubiquitous — tested against a planted hub in
    # test_pipeline_ops instead)
    return ngram_jaccard_pairs(
        _augmented_docs(spark, sf_dir), threshold=JACCARD_T, df_cap=None
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(
        _augmented_docs(spark, sf_dir),
        threshold=JACCARD_T,
        num_hashes=128,
        bands=64,  # r=2 rows/band: recall 1 - (1-J^2)^64 ~ 1 at J >= 0.6
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.operators.dedup import simhash_signatures

    return simhash_signatures(_t(spark, sf_dir, "documents"))


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs at a low threshold — brute_force verifies the
    cosine expression itself (the LSH scale path is exercised, with planted
    true near-dups, by dedup_embedding_lsh)."""
    from graphzeppelin_spark.operators.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=COS_T, brute_force=True
    )


PERT = 0.2  # planted near-dup perturbation weight
LSH_T = 0.9  # only planted pairs sit above this cosine


def _augmented_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings plus deterministic near-duplicates at vec_id+100000:
    e'[i] = e[i] + PERT * e[(i+1) mod d] — a non-uniform mix, so cosine
    lands ~0.97-0.99 (a pure rescale would be exactly 1.0 and test nothing)."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mut = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            f"transform(embedding, (x, i) -> cast(x as double) + {PERT} * "
            "cast(element_at(embedding, (cast(i+1 as int) % size(embedding)) + 1) as double))"
        ).alias("embedding"),
    )
    return e.select("vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("embedding")).unionAll(mut)


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-bucketed near-dup path (the 100TB default) against planted
    true near-dups; exact-verified, so output = the true pairs at LSH_T."""
    from graphzeppelin_spark.operators.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _augmented_embeddings(spark, sf_dir),
        threshold=LSH_T,
        num_tables=12,
        num_planes=6,
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return cosine_topk(emb, queries, k=5)


def _ann_gate_inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(corpus, queries) for the ANN recall gates: corpus = embeddings plus
    planted near-duplicates; queries = the planted mutants of every 50th
    vector. Each query's exact nearest neighbor is its parent at cosine
    ~0.98, with the next-best below ~0.6 — a margin every correct ANN index
    must clear, and a deterministic expected answer an oracle can assert."""
    corpus = _augmented_embeddings(spark, sf_dir)
    queries = corpus.where(
        (F.col("vec_id") >= 100000) & ((F.col("vec_id") - 100000) % 50 == 0)
    )
    return corpus, queries


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN correctness gate: recall@1 of the planted nearest neighbor.

    The oracle asserts hits=1 / recall=1.0 for every query; any regression
    in the index (training, assignment, probing, rerank) misses parents and
    fails the hash check."""
    from graphzeppelin_spark.operators.similarity import ann_recall_at_k, ivf_topk

    corpus, queries = _ann_gate_inputs(spark, sf_dir)
    ann = ivf_topk(corpus, queries, k=1, n_centroids=16, nprobe=4)
    return ann_recall_at_k(corpus, queries, ann, k=1)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN correctness gate: recall@1 of the planted nearest neighbor
    (see q_ann_ivf)."""
    from graphzeppelin_spark.operators.similarity import ann_recall_at_k, lsh_topk

    corpus, queries = _ann_gate_inputs(spark, sf_dir)
    ann = lsh_topk(corpus, queries, k=1, num_tables=16, num_planes=6)
    return ann_recall_at_k(corpus, queries, ann, k=1)


SIMHASH_MAXHAM = 6


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by simhash: banded-bucket candidates + exact hamming
    filter. The oracle reproduces both stages — the 4x12-bit band buckets
    AND bit_count(xor) <= k — from the bit-exact signature twin."""
    from graphzeppelin_spark.operators.dedup import simhash_dedup_pairs

    return simhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=SIMHASH_MAXHAM
    )


def q_rel_time_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (the batch twin of the streaming
    windowed aggregation): hourly event counts + value sums."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal sum: exact and order-independent (a double sum's value
            # depends on reduction order, which differs across engines)
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphzeppelin_spark.functions.text import text_profile

    return text_profile(_t(spark, sf_dir, "documents"))


QUALITY_MIN = 0.5  # pipeline-composition quality gate


def q_pipeline_quality_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline COMPOSITION, the thing a user
    actually runs: text_profile -> quality filter -> exact-dedup canonical
    selection -> per-language corpus stats. One oracle covers the composed
    plan, not just each stage."""
    from graphzeppelin_spark.functions.text import text_profile
    from graphzeppelin_spark.operators.dedup import exact_dedup_groups

    docs = _t(spark, sf_dir, "documents")
    prof = text_profile(docs)
    canon = exact_dedup_groups(docs).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    kept = prof.where(F.col("quality") >= QUALITY_MIN).join(canon, "doc_id")
    return kept.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


WINNOW_K = 5
WINNOW_W = 4


def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (SIGMOD'03) — the substring-level
    dedup primitive; bit-for-bit SQL twin in the oracle."""
    from graphzeppelin_spark.functions.text import winnowing_fingerprints

    return winnowing_fingerprints(
        _t(spark, sf_dir, "documents").where(F.col("doc_id") < DOC_LIMIT),
        k=WINNOW_K,
        w=WINNOW_W,
    )


# ---------------------------------------------------------------- multimodal

MM_LIMIT = 150  # planted media corpus size
MM_RATE = 8000  # planted WAV sample rate
MM_SAMPLES = 2000  # planted WAV length


def _planted_png_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, blob) real PNG blobs planted deterministically from doc_id:
    a (12 + id%5) x (16 + id%9) grayscale image with pixel[j] =
    (id*7 + j*13) % 256 — closed-form, so a SQL oracle can assert the decoded
    width/height/mean without any image library."""
    import numpy as np
    import pandas as pd

    from graphzeppelin_spark.operators.multimodal import encode_png

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < MM_LIMIT).select("doc_id")

    def _mk(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                w, h = 16 + did % 9, 12 + did % 5
                j = np.arange(w * h, dtype=np.int64)
                px = ((did * 7 + j * 13) % 256).astype(np.uint8).reshape(h, w)
                ids.append(did)
                blobs.append(encode_png(px))
            yield pd.DataFrame({"media_id": ids, "blob": blobs})

    return d.mapInPandas(_mk, schema="media_id long, blob binary")


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG decode gate: encode planted images, decode them with the
    stdlib zlib+numpy PNG decoder, and emit dimensions + mean pixel — the
    oracle recomputes all three in closed form."""
    from graphzeppelin_spark.functions.text import round_portable
    from graphzeppelin_spark.operators.multimodal import decode_image_meta

    meta = decode_image_meta(_planted_png_media(spark, sf_dir))
    return meta.select(
        "media_id", "width", "height",
        round_portable(F.col("mean_px"), 6).alias("mean_px"),
    )


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode gate: planted PCM16 blobs with sample[j] =
    ((id*31 + j*17) % 4096) - 2048; the oracle recomputes rate/frames/
    duration/rms in closed form (all sums exact in doubles)."""
    import numpy as np
    import pandas as pd

    from graphzeppelin_spark.operators.multimodal import decode_audio_meta, encode_wav

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < MM_LIMIT).select("doc_id")

    def _mk(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                j = np.arange(MM_SAMPLES, dtype=np.int64)
                s = (((did * 31 + j * 17) % 4096) - 2048).astype(np.int16)
                ids.append(did)
                blobs.append(encode_wav(s, sample_rate=MM_RATE))
            yield pd.DataFrame({"media_id": ids, "blob": blobs})

    from graphzeppelin_spark.functions.text import round_portable

    media = d.mapInPandas(_mk, schema="media_id long, blob binary")
    meta = decode_audio_meta(media)
    return meta.select(
        "media_id",
        "sample_rate",
        "n_frames",
        round_portable(F.col("duration_sec"), 6).alias("duration_sec"),
        round_portable(F.col("rms"), 6).alias("rms"),
    )


# ------------------------------------------------------------ pages front-end

PAGE_LIMIT = 200  # synthetic crawl size (docs 0..199)


def _synthetic_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pages table (BASELINE.json input_hint shape: url,
    warc_ts, html binary, text, lang) derived from documents so DuckDB can
    construct the byte-identical html and twin the extraction. Page i links
    to pages (3i+1)%L and (5i+2)%L plus one offsite url (dropped by
    edge_table: targets outside the crawl are dangling)."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < PAGE_LIMIT)

    def u(e):
        return F.concat(F.lit("https://ex.com/"), e.cast("string"))

    html = F.concat(
        F.lit('<html><head><title>p</title></head><body><a href="'),
        u((F.col("doc_id") * 3 + 1) % PAGE_LIMIT),
        F.lit('">x</a><article>'),
        F.col("text"),
        F.lit('</article><a href="'),
        u((F.col("doc_id") * 5 + 2) % PAGE_LIMIT),
        F.lit('">y</a><a href="https://offsite.example/z">z</a></body></html>'),
    )
    return d.select(
        u(F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.col("text").alias("text"),
        F.lit("en").alias("lang"),
    )


def q_pages_text_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The front-end's core invariant: extract_text(html) is byte-identical
    to the stored text column, per url."""
    from graphzeppelin_spark.sources.pages import extract_text

    return extract_text(_synthetic_pages(spark, sf_dir))


def q_pages_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pages→edges front-end (href extraction → dense url ids →
    canonical deduped edge table), mapped back to urls so an independent
    regexp_extract_all twin can verify the edge set (the dense ids themselves
    are partition-order-dependent and checked in pytest)."""
    from graphzeppelin_spark.sources.pages import edge_table, url_dictionary

    pages = _synthetic_pages(spark, sf_dir)
    d = url_dictionary(pages)
    edges = edge_table(pages, url_dict=d)
    su = d.select(F.col("vid").alias("src"), F.col("url").alias("src_u"))
    du = d.select(F.col("vid").alias("dst"), F.col("url").alias("dst_u"))
    return (
        edges.join(su, "src")
        .join(du, "dst")
        .select(
            F.least("src_u", "dst_u").alias("src_url"),
            F.greatest("src_u", "dst_u").alias("dst_url"),
        )
        .distinct()
    )


# ----------------------------------------------------------------- relational


def q_rel_scan_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter pushdown + grouped aggregates."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("n_rows"),
        )
    )


def q_rel_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_rel_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-sets coverage: order counts/totals by (status, priority)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def q_rel_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT coverage: customers with BUILDING segment vs with orders
    over 100k — (custkey, bucket) where bucket tags which set operation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    big = (
        o.where(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    both = building.intersect(big).select("k", F.lit("both").alias("bucket"))
    only_b = building.exceptAll(big).select("k", F.lit("building_only").alias("bucket"))
    return both.unionAll(only_b)


def q_rel_window_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function coverage: latest event per user."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 2).alias("value"))
    )


# ------------------------------------------------------------------ contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact connected components over customer-key chains at sf0.001."""
    return q_cc_chain(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cc_chain": q_cc_chain,
        "cc_sketch_chain": q_cc_sketch_chain,
        "cc_distributed_chain": q_cc_distributed_chain,
        "labelprop_chain": q_labelprop_chain,
        "labelprop_mode_chain": q_labelprop_mode_chain,
        "pagerank_chain": q_pagerank_chain,
        "triangle_count_circulant": q_triangle_count,
        "triangles_per_vertex_circulant": q_triangles_per_vertex,
        "triangle_count_csr_circulant": q_triangle_count_csr,
        "spanning_forest_chain": q_spanning_forest_chain,
        "component_sets_chain": q_component_sets_chain,
        "point_queries_chain": q_point_queries_chain,
        "k_spanning_forests_chain": q_k_spanning_forests_chain,
        "degrees_salted_chain": q_degrees_salted,
        "stream_parity_events": q_stream_parity,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_embedding_cosine": q_dedup_embedding,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "text_profile": q_text_profile,
        "text_winnow": q_text_winnow,
        "pipeline_quality_dedup": q_pipeline_quality_dedup,
        "pages_text_identity": q_pages_text_identity,
        "pages_edges": q_pages_edges,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_audio": q_multimodal_audio,
        "rel_scan_agg": q_rel_scan_agg,
        "rel_join_topk": q_rel_join_topk,
        "rel_window_last_event": q_rel_window_last_event,
        "rel_cube_agg": q_rel_cube_agg,
        "rel_setops": q_rel_setops,
        "rel_time_window_agg": q_rel_time_window_agg,
    }


# ------------------------------------------------------------------- oracles


_CHAIN_SQL = f"""
edges AS (
  SELECT c_custkey - 1 AS src, c_custkey AS dst
  FROM customer WHERE c_custkey % {CHAIN_MOD} <> 0
),
bi AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
verts AS (SELECT c_custkey AS v FROM customer)
"""

_CC_CHAIN_ORACLE = f"""
WITH RECURSIVE {_CHAIN_SQL},
walk(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT bi.dst AS v, walk.l FROM walk JOIN bi ON bi.src = walk.v
)
SELECT v, MIN(l) AS component FROM walk GROUP BY v
"""


def _labelprop_mode_oracle() -> str:
    """Unrolled synchronous mode-rule supersteps, in lockstep with the
    engine: per superstep each vertex takes the most frequent neighbor
    label (ROW_NUMBER over count DESC, label ASC — the engine's exact
    tie-break), keeping its own label when no neighbor contributes.
    Contributions come only from labeled vertices (the customer universe),
    matching the engine's vertices= restriction."""
    blocks = ["l0 AS MATERIALIZED (SELECT v, v AS label FROM verts)"]
    for i in range(LP_MODE_ITERS):
        p, c = f"l{i}", f"l{i + 1}"
        blocks.append(f"""{c} AS MATERIALIZED (
  SELECT l.v, COALESCE(m.nbr_label, l.label) AS label
  FROM {p} l
  LEFT JOIN (
    SELECT v, label AS nbr_label FROM (
      SELECT bi.dst AS v, x.label,
             ROW_NUMBER() OVER (PARTITION BY bi.dst
                                ORDER BY COUNT(*) DESC, x.label ASC) AS rn
      FROM bi JOIN {p} x ON bi.src = x.v
      GROUP BY bi.dst, x.label
    ) WHERE rn = 1
  ) m ON m.v = l.v
)""")
    return (
        f"WITH {_CHAIN_SQL},\n"
        + ",\n".join(blocks)
        + f"\nSELECT v, label AS component FROM l{LP_MODE_ITERS}"
    )


def _pagerank_oracle() -> str:
    # every CTE is MATERIALIZED: each r{i} is referenced twice (contributions
    # + dangling sum); inlining would expand the plan exponentially
    n_expr = "(SELECT count(*) FROM verts)"
    iters = [
        f"r0 AS MATERIALIZED (SELECT d.v AS v, 1.0 / {n_expr} AS score, d.outdeg FROM deg d)"
    ]
    for i in range(PR_ITERS):
        prev, cur = f"r{i}", f"r{i + 1}"
        iters.append(
            f"""{cur} AS MATERIALIZED (
  SELECT d.v AS v,
         (1 - {PR_DAMP}) / {n_expr}
         + {PR_DAMP} * (COALESCE(inc.s, 0)
                        + (SELECT COALESCE(SUM(score), 0) FROM {prev} WHERE outdeg = 0) / {n_expr})
           AS score,
         d.outdeg
  FROM deg d
  LEFT JOIN (
    SELECT bi.dst AS v, SUM(p.score / p.outdeg) AS s
    FROM bi JOIN {prev} p ON bi.src = p.v GROUP BY bi.dst
  ) inc ON inc.v = d.v
)"""
        )
    chain_mat = _CHAIN_SQL.replace("AS (", "AS MATERIALIZED (", 1).replace(
        "bi AS (", "bi AS MATERIALIZED ("
    ).replace("verts AS (", "verts AS MATERIALIZED (")
    return f"""
WITH {chain_mat},
deg AS MATERIALIZED (
  SELECT verts.v, COALESCE(cnt.c, 0) AS outdeg
  FROM verts LEFT JOIN (SELECT src, count(*) AS c FROM bi GROUP BY src) cnt
    ON cnt.src = verts.v
),
{", ".join(iters)}
SELECT v, {_rp("score", 9)} AS score FROM r{PR_ITERS}
"""


_CIRC_SQL = f"""
verts AS (SELECT DISTINCT p_partkey % {CIRC_MOD} AS v FROM part),
e0 AS (
  SELECT v AS a, (v + 1) % {CIRC_MOD} AS b FROM verts
  UNION
  SELECT v AS a, (v + 2) % {CIRC_MOD} AS b FROM verts
),
edges AS (
  SELECT DISTINCT LEAST(a, b) AS src, GREATEST(a, b) AS dst FROM e0 WHERE a <> b
),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst
)
"""

_AUG_DOCS_SQL = f"""
docs2 AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {DOC_LIMIT}
  UNION ALL
  SELECT doc_id + 10000 AS doc_id,
         substring(text, 1, CAST(floor(length(text) * 0.8) AS INT)) AS text
  FROM documents WHERE doc_id < {DOC_LIMIT}
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(length(text) - 2, 1)),
                               i -> substring(text, i, 3))) AS shingle
  FROM docs2
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
"""

_JACCARD_ORACLE = f"""
WITH {_AUG_DOCS_SQL}
SELECT doc_a, doc_b
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE inter >= {JACCARD_T} * (sa.sz + sb.sz - inter)
"""


def _rp(expr: str, digits: int) -> str:
    """SQL twin of text.round_portable — floor(x*10^d + 0.5)/10^d, the only
    rounding form two engines agree on at decimal ties over doubles."""
    scale = 10**digits
    return f"(floor(({expr}) * {scale}.0 + 0.5) / {scale}.0)"


def _text_profile_oracle() -> str:
    from graphzeppelin_spark.functions.text import LANG_MARKERS, STOPWORDS

    def cnt(word: str) -> str:
        w = word.replace("'", "''")
        return (
            "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
            f" x -> x = '{w}'))"
        )

    ntok = (
        "(CASE WHEN length(trim(text)) = 0 THEN 0"
        " ELSE len(string_split_regex(trim(text), '\\s+')) END)"
    )
    scores = {
        lang: "(" + " + ".join(cnt(w) for w in words) + ")"
        for lang, words in LANG_MARKERS.items()
    }
    order = ["en", "de", "fr", "es", "zh"]
    branches = []
    for i, lang in enumerate(order):
        conds = [f"{scores[lang]} > 0"] + [
            f"{scores[lang]} >= {scores[o]}" for o in order[i + 1 :]
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    lang_case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    sw_sum = " + ".join(cnt(w) for w in STOPWORDS)
    punct_raw = (
        "(length(text) - length(translate(text, '.,!?;:', '')))"
        " / greatest(length(text), 1)"
    )
    punct9 = _rp(punct_raw, 9)
    sw9 = _rp(f"({sw_sum}) / greatest({ntok}, 1)", 9)
    quality = _rp(
        f"0.4 * least(length(text) / 500.0, 1.0)"
        f" + 0.3 * greatest(1.0 - abs({sw9} - 0.4) / 0.4, 0.0)"
        f" + 0.3 * (1.0 - least({punct9} * 10, 1.0))",
        6,
    )
    return f"""
SELECT doc_id,
       {ntok} AS n_tokens,
       greatest({ntok}, CAST(ceil(length(text) / 4.0) AS BIGINT)) AS n_subword_tokens,
       {_rp(punct_raw, 6)} AS punct_ratio,
       {_rp(f"({sw_sum}) / greatest({ntok}, 1)", 6)} AS stopword_ratio,
       {quality} AS quality,
       {lang_case} AS lang_pred,
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


def _simhash_sig_cte() -> str:
    """Bit-for-bit SQL twin of dedup.simhash_signatures as a CTE body:
    md5-derived 60-bit token hashes, arithmetic bit extraction, 48 vote sums,
    vote-majority signature — every step identical to the Spark expressions."""
    from graphzeppelin_spark.operators.dedup import SIMHASH_BITS

    votes = ", ".join(
        f"SUM(2 * ((h // {1 << j}) % 2) - 1) AS b{j}" for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""
toks AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
  FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents
  )
  WHERE tok <> ''
),
votes AS (SELECT doc_id, {votes} FROM toks GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes),
sigs AS (
  SELECT d.doc_id, COALESCE(sig.simhash, 0) AS simhash
  FROM documents d LEFT JOIN sig ON sig.doc_id = d.doc_id
)"""


def _simhash_oracle() -> str:
    return f"WITH {_simhash_sig_cte()} SELECT doc_id, simhash FROM sigs"


def _simhash_pairs_oracle() -> str:
    """Both operator stages reproduced: 4 x 12-bit band buckets (arithmetic
    shift) for candidates, then exact bit_count(xor) hamming filter."""
    from graphzeppelin_spark.operators.dedup import SIMHASH_BITS

    bw = SIMHASH_BITS // 4
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band,"
        f" (simhash // {1 << (bw * i)}) % {1 << bw} AS bucket FROM sigs"
        for i in range(4)
    )
    return f"""
WITH {_simhash_sig_cte()},
bands AS ({band_rows}),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sa, b.simhash AS sb
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b FROM cands WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAXHAM}
"""


_AUG_EMB_SQL = f"""
e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
aug AS (
  SELECT vec_id, v FROM e0
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(generate_series(1, len(v)),
                        i -> v[i] + {{pert}} * v[(i % len(v)) + 1]) AS v
  FROM e0
)
"""


def oracle_sql() -> dict[str, str]:
    cos = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
"""
    ann_recall_oracle = """
SELECT vec_id + 100000 AS query_id, CAST(1 AS BIGINT) AS hits,
       CAST(1.0 AS DOUBLE) AS recall
FROM embeddings WHERE vec_id % 50 = 0
"""
    return {
        "cc_chain": _CC_CHAIN_ORACLE,
        "cc_sketch_chain": _CC_CHAIN_ORACLE,
        "cc_distributed_chain": _CC_CHAIN_ORACLE,
        "labelprop_chain": _CC_CHAIN_ORACLE,
        "labelprop_mode_chain": _labelprop_mode_oracle(),
        "pagerank_chain": _pagerank_oracle(),
        "triangle_count_circulant": f"WITH {_CIRC_SQL} SELECT count(*) AS n_triangles FROM tri",
        "triangle_count_csr_circulant": f"WITH {_CIRC_SQL} SELECT count(*) AS n_triangles FROM tri",
        "triangles_per_vertex_circulant": f"""
WITH {_CIRC_SQL},
flat AS (
  SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
)
SELECT v, count(*) AS tri FROM flat GROUP BY v
""",
        "spanning_forest_chain": f"""
SELECT c_custkey - 1 AS src, c_custkey AS dst
FROM customer WHERE c_custkey % {CHAIN_MOD} <> 0
""",
        "component_sets_chain": f"""
WITH RECURSIVE {_CHAIN_SQL},
walk(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT bi.dst AS v, walk.l FROM walk JOIN bi ON bi.src = walk.v
),
cc AS (SELECT v, MIN(l) AS component FROM walk GROUP BY v)
SELECT component, array_to_string(list(v ORDER BY v), ',') AS members
FROM cc GROUP BY component
""",
        "point_queries_chain": f"""
WITH RECURSIVE {_CHAIN_SQL},
walk(v, l) AS (
  SELECT v, v FROM verts
  UNION
  SELECT bi.dst AS v, walk.l FROM walk JOIN bi ON bi.src = walk.v
),
cc AS (SELECT v, MIN(l) AS component FROM walk GROUP BY v),
pairs(a, b) AS (VALUES (1, 2), (31, 32), (32, 33), (33, 40))
SELECT p.a, p.b, (ca.component = cb.component) AS connected
FROM pairs p JOIN cc ca ON ca.v = p.a JOIN cc cb ON cb.v = p.b
""",
        "k_spanning_forests_chain": f"""
SELECT CAST(0 AS INT) AS k, c_custkey - 1 AS src, c_custkey AS dst
FROM customer WHERE c_custkey % {CHAIN_MOD} <> 0
""",
        "degrees_salted_chain": f"""
WITH edges AS (
  SELECT c_custkey - 1 AS src, c_custkey AS dst
  FROM customer WHERE c_custkey % {CHAIN_MOD} <> 0
),
bi AS (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)
SELECT v, count(*) AS degree FROM bi GROUP BY v
""",
        "stream_parity_events": """
SELECT user_id, event_type FROM events
GROUP BY user_id, event_type HAVING count(*) % 2 = 1
""",
        "dedup_exact": """
SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
FROM documents GROUP BY md5(text)
""",
        "dedup_ngram_jaccard": _JACCARD_ORACLE,
        "dedup_minhash": _JACCARD_ORACLE,
        "dedup_embedding_cosine": f"""
{cos}
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {COS_T}
""",
        "dedup_embedding_lsh": f"""
WITH {_AUG_EMB_SQL.format(pert=PERT)}
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM aug a JOIN aug b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {LSH_T}
""",
        "dedup_simhash": _simhash_oracle(),
        "dedup_simhash_pairs": _simhash_pairs_oracle(),
        "ann_lsh": ann_recall_oracle,
        "ann_ivf": ann_recall_oracle,
        "ann_cosine_topk": f"""
{cos},
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, c.v), 4) AS score
  FROM e q JOIN e c ON q.vec_id <> c.vec_id
  WHERE q.vec_id % 50 = 0
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, score FROM ranked WHERE rn <= 5
""",
        "text_profile": _text_profile_oracle(),
        "pipeline_quality_dedup": f"""
WITH prof AS ({_text_profile_oracle()}),
canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT lang_pred, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM prof JOIN canon USING (doc_id)
WHERE quality >= {QUALITY_MIN}
GROUP BY lang_pred
""",
        "text_winnow": f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
  FROM documents WHERE doc_id < {DOC_LIMIT}
),
kg AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(length(t) - {WINNOW_K - 1}, 1)),
                        i -> ('0x' || substr(md5(substring(t, i, {WINNOW_K})), 1, 15))::BIGINT) AS hs
  FROM norm
),
fps AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(len(hs) - {WINNOW_W - 1}, 1)),
                                      i -> list_min(hs[i : i + {WINNOW_W - 1}]))) AS fp_list
  FROM kg
)
SELECT doc_id, unnest(fp_list) AS fp FROM fps
""",
        "multimodal_meta": f"""
SELECT doc_id AS media_id,
       CAST(16 + doc_id % 9 AS INT) AS width,
       CAST(12 + doc_id % 5 AS INT) AS height,
       {_rp('''list_avg(list_transform(
           range(0, CAST((16 + doc_id % 9) * (12 + doc_id % 5) AS BIGINT)),
           j -> (doc_id * 7 + j * 13) % 256))''', 6)} AS mean_px
FROM documents WHERE doc_id < {MM_LIMIT}
""",
        "multimodal_audio": f"""
WITH s AS (
  SELECT doc_id,
         list_transform(range(0, {MM_SAMPLES}),
                        j -> ((doc_id * 31 + j * 17) % 4096) - 2048) AS sm
  FROM documents WHERE doc_id < {MM_LIMIT}
)
SELECT doc_id AS media_id,
       CAST({MM_RATE} AS INT) AS sample_rate,
       CAST({MM_SAMPLES} AS BIGINT) AS n_frames,
       {_rp(f"{MM_SAMPLES} / {MM_RATE}.0", 6)} AS duration_sec,
       {_rp("sqrt(list_avg(list_transform(sm, x -> CAST(x AS DOUBLE) * x)))", 6)} AS rms
FROM s
""",
        "pages_text_identity": f"""
SELECT concat('https://ex.com/', doc_id) AS url, text AS extracted_text
FROM documents WHERE doc_id < {PAGE_LIMIT}
""",
        "pages_edges": rf"""
WITH pages AS (
  SELECT concat('https://ex.com/', doc_id) AS url,
         concat('<html><head><title>p</title></head><body><a href="https://ex.com/',
                (doc_id * 3 + 1) % {PAGE_LIMIT}, '">x</a><article>', text,
                '</article><a href="https://ex.com/', (doc_id * 5 + 2) % {PAGE_LIMIT},
                '">y</a><a href="https://offsite.example/z">z</a></body></html>') AS html
  FROM documents WHERE doc_id < {PAGE_LIMIT}
),
hrefs AS (
  SELECT url AS src_url,
         unnest(regexp_extract_all(html, '<a\s+[^>]*href="([^"]+)"', 1)) AS dst_url
  FROM pages
),
inset AS (SELECT url FROM pages)
SELECT DISTINCT least(src_url, dst_url) AS src_url, greatest(src_url, dst_url) AS dst_url
FROM hrefs JOIN inset ON hrefs.dst_url = inset.url
WHERE src_url <> dst_url
""",
        "rel_scan_agg": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
        "rel_join_topk": """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
        "rel_cube_agg": """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
        "rel_setops": """
WITH building AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 100000)
SELECT k, 'both' AS bucket FROM (SELECT k FROM building INTERSECT SELECT k FROM big)
UNION ALL
SELECT k, 'building_only' AS bucket FROM (SELECT k FROM building EXCEPT SELECT k FROM big)
""",
        "rel_time_window_agg": """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
""",
        "rel_window_last_event": """
WITH ranked AS (
  SELECT user_id, event_id, event_type, round(value, 2) AS value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, event_type, value FROM ranked WHERE rn = 1
""",
    }
