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
# packed sorted 16-byte digests, one blob per group: ~16B per seen hash vs
# ~70B+ for an array of 32-char hex strings.
# STATE-SCHEMA BREAK (round 4): this was array<string> of hex digests before
# the binary packing; a query restarted from a stream checkpoint written
# under the old schema will fail/misparse its state rows. Restarting this
# operator across the upgrade requires a NEW streaming checkpoint dir (and a
# replay, or seeding StreamingDedup's survivor table from the old output).
_DEDUP_STATE = T.StructType([T.StructField("seen", T.BinaryType(), True)])


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-occurrence filter over a stream of documents.

    Input: streaming DataFrame with (doc_id, `text_col`). Output: one row
    per novel content hash, in arrival order across micro-batches. The
    seen-hash set is partitioned into 256 hash-prefix groups so no single
    group's state grows beyond ~1/256 of the corpus hashes and the state
    shuffle stays balanced (the same skew argument as the batch operators);
    each group's state is one packed blob of sorted raw digests.

    Scale bound: applyInPandasWithState re-serializes each touched group's
    whole blob every micro-batch, so total state is still O(distinct hashes)
    in the state store — fine for bounded keyspaces (sessions, per-tenant
    sets), wrong for an unbounded corpus. For corpus-scale streaming dedup
    use StreamingDedup below: its seen-set lives in a compacted parquet
    table that is only APPENDED per batch, never rewritten.
    """
    hashed = docs.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("text_md5"),
        F.substring(F.md5(F.col(text_col)), 1, 2).alias("bucket"),
    )

    def _dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        blob = (state.get[0] or b"") if state.exists else b""
        seen = {blob[i : i + 16] for i in range(0, len(blob), 16)}
        for pdf in pdfs:
            # canonical within-batch winner: smallest doc_id of a content
            # group (post-shuffle row order is arbitrary, so sort first)
            pdf = pdf.sort_values("doc_id")
            dig = pdf["text_md5"].map(bytes.fromhex)
            fresh_mask = ~dig.isin(seen) & ~dig.duplicated()
            if fresh_mask.any():
                seen.update(dig[fresh_mask])
                yield pdf.loc[fresh_mask, ["doc_id", "text_md5"]]
        state.update((b"".join(sorted(seen)),))

    return hashed.groupBy("bucket").applyInPandasWithState(
        _dedup,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class StreamingDedup:
    """Corpus-scale streaming exact dedup with bounded, append-only state.

    The seen-set is a parquet table of (h: 16-byte digest, doc_id) — the
    survivor set itself. Per micro-batch (foreachBatch):

    1. hash the batch, pick the canonical within-batch winner per digest
       (min doc_id — one algebraic groupBy);
    2. stream-static LEFT ANTI join against the survivors table drops
       everything seen in ANY earlier batch;
    3. APPEND only the novel rows to the table. Nothing existing is ever
       rewritten, so per-batch state I/O is O(novel hashes), not O(corpus)
       — the fix for the applyInPandasWithState variant's rewrite-the-world
       behavior.

    A retried batch (foreachBatch is at-least-once) re-runs the anti-join
    against a table that already contains its hashes and appends nothing —
    the table converges to exactly the first-occurrence set.

    Compaction: appends accumulate one small file set per batch; when the
    file count passes `compact_threshold` the table is rewritten coalesced
    and atomically swapped (rename), keeping scan cost flat. At 100 TB the
    same design holds with the table bucketed by `h` so the anti-join is a
    co-partitioned shuffle-free probe (Iceberg/Delta compaction jobs replace
    the rename dance)."""

    def __init__(
        self,
        spark,
        source_dir: str,
        table_dir: str,
        stream_checkpoint_dir: str,
        text_col: str = "text",
        input_schema: str = "doc_id long, text string",
        compact_threshold: int = 64,
    ):
        import os

        self.spark = spark
        self.table_dir = table_dir
        self.text_col = text_col
        self.compact_threshold = compact_threshold
        os.makedirs(source_dir, exist_ok=True)
        self._source = spark.readStream.schema(input_schema).parquet(source_dir)
        self._stream_ckpt = stream_checkpoint_dir
        self._recover_compaction()

    def _recover_compaction(self) -> None:
        """Heal a crash mid-compaction: the swap is rename(table → .old) then
        rename(.compacting → table). If the first rename landed but the
        second didn't, the REAL survivor set is the .old directory — restore
        it (losing it would make every previously-seen hash re-emit as a
        survivor). Leftover .compacting/.old directories are then stale and
        removed."""
        import os
        import shutil

        old = self.table_dir.rstrip("/") + ".old"
        tmp = self.table_dir.rstrip("/") + ".compacting"
        if not os.path.isdir(self.table_dir) and os.path.isdir(old):
            os.rename(old, self.table_dir)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

    def _table_files(self) -> list[str]:
        import os

        if not os.path.isdir(self.table_dir):
            return []
        return [
            f
            for f in os.listdir(self.table_dir)
            if f.startswith("part-") and f.endswith(".parquet")
        ]

    def _fold(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        winners = (
            batch_df.select(
                "doc_id", F.unhex(F.md5(F.col(self.text_col))).alias("h")
            )
            .groupBy("h")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        if self._table_files():
            seen = self.spark.read.parquet(self.table_dir).select("h")
            winners = winners.join(seen, "h", "left_anti")
        winners.select("h", "doc_id").write.mode("append").parquet(self.table_dir)
        if len(self._table_files()) > self.compact_threshold:
            self._compact()

    def _compact(self) -> None:
        import os
        import shutil

        tmp = self.table_dir.rstrip("/") + ".compacting"
        shutil.rmtree(tmp, ignore_errors=True)
        self.spark.read.parquet(self.table_dir).coalesce(
            max(1, self.compact_threshold // 8)
        ).write.mode("overwrite").parquet(tmp)
        old = self.table_dir.rstrip("/") + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.table_dir, old)
        os.rename(tmp, self.table_dir)
        shutil.rmtree(old, ignore_errors=True)

    def process_available(self) -> None:
        """Consume everything currently in the source directory and stop."""
        q = (
            self._source.writeStream.foreachBatch(self._fold)
            .option("checkpointLocation", self._stream_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def survivors(self) -> DataFrame:
        """(doc_id, text_md5) — the first-occurrence set so far."""
        if not self._table_files():
            return self.spark.createDataFrame([], "doc_id long, text_md5 string")
        return self.spark.read.parquet(self.table_dir).select(
            "doc_id", F.lower(F.hex("h")).alias("text_md5")
        )

    def state_bytes(self) -> int:
        """On-disk size of the seen/survivor table (the bounded-state gate)."""
        import os

        return sum(
            os.path.getsize(os.path.join(self.table_dir, f))
            for f in self._table_files()
        )
