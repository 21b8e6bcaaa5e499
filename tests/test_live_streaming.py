"""Structured Streaming live ingest: files appear → foldInto state → query."""

from __future__ import annotations

import numpy as np
import pytest

from graphzeppelin_spark import oracle
from graphzeppelin_spark.sources.generators import dynamic_erdos_stream
from graphzeppelin_spark.streaming.live import LiveGraphStream
from tests.conftest import stream_df


def test_live_ingest_two_waves(spark, tmp_path):
    n = 128
    s = dynamic_erdos_stream(num_vertices=n, density=0.02, rounds=2, seed=23)
    half = len(s) // 2
    src_dir = str(tmp_path / "incoming")
    live = LiveGraphStream(
        spark,
        src_dir,
        num_vertices=n,
        stream_checkpoint_dir=str(tmp_path / "stream_ckpt"),
        state_checkpoint_dir=str(tmp_path / "state_ckpt"),
        seed=5,
    )

    # wave 1 arrives
    stream_df(spark, s.iloc[:half]).write.mode("append").parquet(src_dir)
    live.process_available()
    assert live.batches_seen >= 1
    mid = oracle.connected_components(oracle.live_edges(s, n, half), n)
    np.testing.assert_array_equal(live.connected_components(), mid)

    # wave 2 arrives; the stream checkpoint ensures wave 1 is not re-read
    stream_df(spark, s.iloc[half:].reset_index(drop=True)).write.mode("append").parquet(
        src_dir
    )
    live.process_available()
    final = oracle.connected_components(oracle.live_edges(s, n), n)
    np.testing.assert_array_equal(live.connected_components(), final)

    # state snapshots were committed per batch
    assert live.store.latest_id() >= 2
