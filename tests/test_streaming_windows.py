"""Event-time streaming: watermarked windows + stateful cross-batch dedup."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from graphzeppelin_spark.streaming.windows import (
    streaming_exact_dedup,
    windowed_event_counts,
)


def test_windowed_counts_batch_matches_manual(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2026-01-01 00:01", "2026-01-01 00:04", "2026-01-01 00:12",
                 "2026-01-01 00:13", "2026-01-01 00:27"]
            ),
            "event_type": ["a", "a", "a", "b", "a"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = (
        windowed_event_counts(spark.createDataFrame(pdf), window="10 minutes")
        .orderBy("window_start", "key")
        .collect()
    )
    got = [(r["window_start"].minute, r["key"], r["n_events"], r["total_value"]) for r in out]
    assert got == [(0, "a", 2, 3.0), (10, "a", 1, 3.0), (10, "b", 1, 4.0), (20, "a", 1, 5.0)]


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    """Same operator on readStream: windows close under the watermark and
    late rows beyond it are dropped."""
    src = str(tmp_path / "ev_src")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2026-01-01 00:01", "2026-01-01 00:11"]),
            "event_type": ["a", "a"],
            "value": [1.0, 1.0],
        }
    )
    spark.createDataFrame(pdf).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(src)
    out_dir = str(tmp_path / "win_out")

    def run():
        q = (
            windowed_event_counts(stream, window="10 minutes", watermark="5 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    # wave 2: 00:30 advances the watermark to 00:25, closing (and emitting)
    # the 00:00-00:10 window
    spark.createDataFrame(
        pd.DataFrame(
            {"ts": pd.to_datetime(["2026-01-01 00:30"]), "event_type": ["a"], "value": [1.0]}
        )
    ).write.mode("append").parquet(src)
    run()
    rows = spark.read.parquet(out_dir).collect()
    w0 = [r for r in rows if r["window_start"].minute == 0]
    assert len(w0) == 1 and w0[0]["n_events"] == 1 and w0[0]["total_value"] == 1.0

    # wave 3: a row at 00:02 is now LATE beyond the watermark (its window end
    # 00:10 < watermark 00:25) — it must be DROPPED, never re-emitting w0
    spark.createDataFrame(
        pd.DataFrame(
            {"ts": pd.to_datetime(["2026-01-01 00:02"]), "event_type": ["a"], "value": [9.0]}
        )
    ).write.mode("append").parquet(src)
    run()
    rows = spark.read.parquet(out_dir).collect()
    w0 = [r for r in rows if r["window_start"].minute == 0]
    assert len(w0) == 1 and w0[0]["n_events"] == 1 and w0[0]["total_value"] == 1.0


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch must be suppressed by the
    per-group state (the cross-batch seen-set), not just within-batch."""
    src = str(tmp_path / "docs_src")
    out_dir = str(tmp_path / "dedup_out")
    wave1 = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["aaa", "bbb", "aaa"]})
    spark.createDataFrame(wave1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)

    def run():
        q = (
            streaming_exact_dedup(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    got1 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {1, 2}  # within-batch dup (doc 3) suppressed

    wave2 = pd.DataFrame({"doc_id": [4, 5], "text": ["bbb", "ccc"]})
    spark.createDataFrame(wave2).write.mode("append").parquet(src)
    run()
    got2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {1, 2, 5}  # cross-batch dup (doc 4 = "bbb") suppressed
