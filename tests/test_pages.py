"""Web front-end: href extraction, byte-identical text invariant, url dictionary,
end-to-end pages → edges → graph queries."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphzeppelin_spark import oracle
from graphzeppelin_spark.operators.connectivity import connected_components_df
from graphzeppelin_spark.sources.generators import (
    multiples_graph_stream,
    pages_table,
    url_for_vertex,
)
from graphzeppelin_spark.sources.pages import (
    edge_table,
    extract_hrefs,
    extract_text,
    url_dictionary,
)


N = 256


@pytest.fixture(scope="module")
def pages_df(spark):
    stream = multiples_graph_stream(N)
    edges = stream[["src", "dst"]].to_numpy()
    pdf = pages_table(edges, N, seed=4)
    return spark.createDataFrame(pdf).persist()


def test_extracted_text_byte_identical(spark, pages_df):
    """BASELINE.json input_hint: extracted text byte-identical per url."""
    joined = extract_text(pages_df).join(pages_df.select("url", "text"), "url")
    mismatches = joined.where(
        F.col("extracted_text").cast("binary") != F.col("text").cast("binary")
    ).count()
    assert mismatches == 0
    assert joined.count() == N


def test_href_extraction_exact_edge_set(spark, pages_df):
    stream = multiples_graph_stream(N)
    expected = {
        (url_for_vertex(int(s)), url_for_vertex(int(d)))
        for s, d in stream[["src", "dst"]].to_numpy()
    }
    got = {
        (r["src_url"], r["dst_url"]) for r in extract_hrefs(pages_df).collect()
    }
    assert got == expected


def test_url_dictionary_dense_and_deterministic(spark, pages_df):
    d1 = url_dictionary(pages_df).orderBy("vid").collect()
    d2 = url_dictionary(pages_df).orderBy("vid").collect()
    assert d1 == d2
    vids = [r["vid"] for r in d1]
    assert vids == list(range(N))


def test_pages_to_cc_end_to_end(spark, pages_df):
    """Full flagship path: pages → hrefs → dictionary → edges → CC.

    The url dictionary orders urls lexicographically, which permutes vertex
    ids; component *counts* are permutation-invariant (golden: 78 at n=1024,
    here the n=256 multiples graph)."""
    edges = edge_table(pages_df, num_partitions=8)
    labels = connected_components_df(edges, vertices=spark.range(N).selectExpr("id as v"))
    got_ncc = labels.select(F.countDistinct("component")).collect()[0][0]
    stream = multiples_graph_stream(N)
    enp = oracle.live_edges(stream, N)
    expected_ncc = len(np.unique(oracle.connected_components(enp, N)))
    assert got_ncc == expected_ncc
