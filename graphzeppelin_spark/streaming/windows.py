"""Event-time streaming operators: watermarked windowed aggregation and a
custom stateful operator (applyInPandasWithState).

The reference's stream is a totally-ordered replayable file (no event time),
so these have no reference analog — they cover the Structured Streaming
surface a live web-crawl ingest needs:

- windowed_event_counts: tumbling/sliding event-time windows with a late-data
  watermark. The same expression tree works on a batch DataFrame (for oracle
  tests) and on readStream (where the watermark actually drops late rows and
  lets Spark age out window state).
- streaming_exact_dedup: cross-batch exact deduplication — emit a document
  only the FIRST time its content hash is seen, with the seen-set held as
  per-group state in applyInPandasWithState (hash-prefix groups keep each
  group's state small and the shuffle balanced; state survives restarts via
  the streaming checkpoint). This is the streaming twin of
  operators/dedup.exact_dedup_groups for a continuously arriving corpus.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start, window_end, key, n_events, total_value) per event-time
    window. On a streaming DataFrame the watermark bounds state and drops
    rows later than `watermark`; on a batch DataFrame withWatermark is a
    no-op and the result is the exact windowed aggregate (the oracle path).
    """
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col).alias("key"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "n_events",
            "total_value",
        )
    )


_DEDUP_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text_md5", T.StringType(), False),
    ]
)
_DEDUP_STATE = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()), True)])


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-occurrence filter over a stream of documents.

    Input: streaming DataFrame with (doc_id, `text_col`). Output: one row
    per novel content hash, in arrival order across micro-batches. The
    seen-hash set is partitioned into 256 hash-prefix groups so no single
    group's state grows beyond ~1/256 of the corpus hashes and the state
    shuffle stays balanced (the same skew argument as the batch operators).
    """
    hashed = docs.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("text_md5"),
        F.substring(F.md5(F.col(text_col)), 1, 2).alias("bucket"),
    )

    def _dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            # canonical within-batch winner: smallest doc_id of a content
            # group (post-shuffle row order is arbitrary, so sort first)
            pdf = pdf.sort_values("doc_id")
            fresh = pdf[~pdf["text_md5"].isin(seen) & ~pdf["text_md5"].duplicated()]
            if len(fresh):
                seen.update(fresh["text_md5"])
                yield fresh[["doc_id", "text_md5"]]
        state.update((sorted(seen),))

    return hashed.groupBy("bucket").applyInPandasWithState(
        _dedup,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
