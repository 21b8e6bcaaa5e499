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


def test_live_pages_stream_incremental_crawl(spark, tmp_path):
    """The input_hint pages table consumed as a LIVE stream in three waves:
    forward links (to pages that arrive in later waves) wait in `pending`
    and resolve when the target lands; after every wave the url-partition
    of the sketch-CC state equals a union-find oracle over the edges whose
    BOTH endpoints have arrived."""
    import numpy as np
    import pandas as pd

    from graphzeppelin_spark.oracle import UnionFind
    from graphzeppelin_spark.sources.generators import pages_table, url_for_vertex
    from graphzeppelin_spark.streaming.live import LivePagesStream

    n = 48
    # two chains: 0-23 and 24-47 (break the edge at 23-24)
    src = np.array([v for v in range(n - 1) if v != 23], dtype=np.int64)
    edges = pd.DataFrame({"src": src, "dst": src + 1})
    pages = pages_table(edges, n)

    src_dir = str(tmp_path / "crawl")
    live = LivePagesStream(
        spark,
        src_dir,
        stream_checkpoint_dir=str(tmp_path / "ckpt"),
        num_vertices_capacity=n,
    )

    def oracle_partition(arrived: set[int]) -> set[frozenset]:
        uf = UnionFind(n)
        for s, d in edges.itertuples(index=False):
            if s in arrived and d in arrived:
                uf.union(int(s), int(d))
        groups: dict[int, set[str]] = {}
        for v in arrived:
            groups.setdefault(uf.find(v), set()).add(url_for_vertex(v))
        return {frozenset(g) for g in groups.values()}

    arrived: set[int] = set()
    for wave, lo in enumerate((0, 16, 32)):
        hi = min(lo + 16, n)
        wave_pdf = pages.iloc[lo:hi]
        spark.createDataFrame(wave_pdf).coalesce(1).write.mode("append").parquet(src_dir)
        live.process_available()
        arrived |= set(range(lo, hi))
        comp = live.url_components()
        assert set(comp) == {url_for_vertex(v) for v in arrived}
        got_partition = {}
        for url, label in comp.items():
            got_partition.setdefault(label, set()).add(url)
        assert {frozenset(g) for g in got_partition.values()} == oracle_partition(arrived)
    # forward links all resolved by the end
    assert live.pending.count() == 0
