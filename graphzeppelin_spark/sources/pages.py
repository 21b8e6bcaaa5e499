"""Web front-end: pages table → href edges (BASELINE.json input_hint).

Input is the Common-Crawl-style table (url: string, warc_ts: timestamp,
html: binary, text: string, lang: string). This module provides:

- extract_text: HTML → text extraction as a pure Catalyst expression
  (regexp_extract inside the JVM, no Python boundary); the per-row invariant
  is that extraction is byte-identical per url with the table's `text`
  column;
- extract_hrefs: href extraction → (src_url, dst_url) pairs, likewise pure
  Catalyst (regexp_extract_all + explode);
- url_dictionary: url → dense long id, deterministic and scalable (hash
  partition → per-partition row_number → add broadcast per-partition
  offsets; no global sort, no single-reducer Window);
- edge_table: the salted, hash-partitioned (src, dst) long-id edge table the
  graph operators consume.

Scale notes: extraction runs inside WholeStageCodegen on the scan — no
ArrowEvalPython node, so the html bytes are never transposed to Arrow or
shipped to Python workers (they previously crossed the boundary through an
Arrow-batched pandas UDF; at sf0.1 the two are within noise of each other —
the fixture cost is join-stage latency — but at crawl scale the extraction
stage is where the TBs flow, and the live-crawl streaming path drops its
python-worker dependency too). A production extractor needing a real HTML
parser would go back behind a mapInArrow of (url, html) only. The dictionary
join broadcasts when small and hash-joins otherwise; the final edge table is
repartitioned by a salted hash of src so power-law hub pages do not pin a
partition (north_rule: explicit skew salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# text = contents of <article>...</article>, as produced by the pages fixture
# ((?s): the article body spans newlines); hrefs = every anchor target. Both
# regexes are mirrored verbatim by the DuckDB oracle twin (pages_edges uses
# the identical href pattern through regexp_extract_all there).
_ARTICLE_PATTERN = r"(?s)<article>(.*?)</article>"
_HREF_PATTERN = r'<a\s+[^>]*href="([^"]+)"'


def extract_text(pages: DataFrame) -> DataFrame:
    """(url, extracted_text) — must be byte-identical to pages.text per url."""
    s = F.col("html").cast("string")
    return pages.select(
        "url",
        F.coalesce(
            F.regexp_extract(s, _ARTICLE_PATTERN, 1), F.lit("")
        ).alias("extracted_text"),
    )


def extract_hrefs(pages: DataFrame) -> DataFrame:
    """(src_url, dst_url) pairs from anchor tags."""
    s = F.col("html").cast("string")
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.regexp_extract_all(s, F.lit(_HREF_PATTERN), F.lit(1)).alias("hrefs"),
        )
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
