"""Round-6 regression tests.

The headline item: pagerank_df / label_propagation_df must materialize an
un-persisted caller edge plan EXACTLY ONCE (round-5 verdict item 1/2 — the
old setup ran the gate count, vertex derivation, and bidirect union against
the raw plan, up to 5 scans; measured 3x wall-clock at kron_19). The test
instruments the input with an accumulator-counting mapInPandas stage, so
every materialization of the caller's plan adds exactly len(edges) to the
accumulator — one scan <=> acc.value == n_edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphzeppelin_spark.operators.connectivity import connected_components_df
from graphzeppelin_spark.operators.labelprop import label_propagation_df
from graphzeppelin_spark.operators.pagerank import pagerank_df

from tests.conftest import edges_df


def _ring_edges(n: int) -> np.ndarray:
    a = np.arange(n, dtype=np.int64)
    return np.stack([a, (a + 1) % n], axis=1)


def _instrumented_edges(spark, arr: np.ndarray):
    """Edge DataFrame whose plan bumps an accumulator by rows-emitted on
    every materialization — a scan counter for the whole raw plan."""
    acc = spark.sparkContext.accumulator(0)
    df = edges_df(spark, arr)

    def _count(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    return df.mapInPandas(_count, "src long, dst long"), acc


@pytest.mark.parametrize("big_threshold", [1, 10**9])
def test_pagerank_single_input_scan(spark, big_threshold):
    arr = _ring_edges(64)
    instr, acc = _instrumented_edges(spark, arr)
    ranks = pagerank_df(instr, num_iters=3, big_threshold=big_threshold)
    assert ranks.count() == 64
    # both plan shapes (big: partition-once + broadcast; small: AQE shuffle)
    # must read the caller's plan exactly once
    assert acc.value == len(arr), f"raw plan scanned {acc.value / len(arr):.1f}x"


@pytest.mark.parametrize("big_threshold", [1, 10**9])
def test_labelprop_single_input_scan(spark, big_threshold):
    arr = _ring_edges(64)
    instr, acc = _instrumented_edges(spark, arr)
    labels = label_propagation_df(instr, big_threshold=big_threshold)
    out = labels.groupBy("label").count().collect()
    assert len(out) == 1  # one ring => one component
    assert acc.value == len(arr), f"raw plan scanned {acc.value / len(arr):.1f}x"


def test_pagerank_scores_unchanged_by_staging(spark):
    # the staging refactor must not change values: compare against the
    # documented numpy power iteration on a small graph with a dangling-ish
    # structure (star + path)
    arr = np.array(
        [[0, 1], [0, 2], [0, 3], [3, 4], [4, 5]], dtype=np.int64
    )
    got = {
        r["v"]: r["score"]
        for r in pagerank_df(edges_df(spark, arr), num_iters=12).collect()
    }
    # numpy oracle (undirected => bidirect)
    n = 6
    d = 0.85
    adj = np.zeros((n, n))
    for s, t in arr:
        adj[s, t] = 1
        adj[t, s] = 1
    outdeg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        contrib = adj.T @ (r / np.where(outdeg == 0, 1, outdeg) * (outdeg > 0))
        dangling = r[outdeg == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    for v in range(n):
        assert got[v] == pytest.approx(r[v], abs=1e-9)


def _stream_df(spark, rows):
    """rows: list of (seq, type, src, dst)."""
    pdf = pd.DataFrame(rows, columns=["seq", "type", "src", "dst"]).astype(
        {"seq": np.int64, "type": np.int32, "src": np.int64, "dst": np.int64}
    )
    return spark.createDataFrame(pdf)


def test_validate_stream_sound_after_resume(spark, tmp_path):
    """ADVICE r5 medium: a resumed parity table restarting empty raised a
    FALSE 'dead delete' on any legitimate delete of a pre-checkpoint edge,
    and resume() silently dropped validate_stream. Now parity is rebuilt
    from the stream prefix: the legit delete passes, coverage is full."""
    from graphzeppelin_spark.streaming.driver import GraphStreamDriver

    ck = str(tmp_path / "drv_ck")
    stream = _stream_df(
        spark,
        [
            (0, 0, 1, 2), (1, 0, 2, 3),  # pre-checkpoint inserts
            (2, 1, 1, 2),                # post-resume: LEGIT delete of (1,2)
        ],
    )
    drv = GraphStreamDriver(
        spark, stream, num_vertices=8, checkpoint_dir=ck, validate_stream=True
    )
    drv.process_stream_until(2)
    resumed = GraphStreamDriver.resume(
        spark, stream, checkpoint_dir=ck, validate_stream=True
    )
    assert resumed.validate_stream is True  # no longer silently dropped
    resumed.process_stream_until(3)  # must NOT raise (was a false positive)
    labels = resumed.connected_components()
    assert labels[1] != labels[2] and labels[2] == labels[3]


def test_validate_stream_after_resume_catches_double_insert(spark, tmp_path):
    """Full coverage after resume: a post-resume re-insert of a
    pre-checkpoint live edge is the cross-batch double insert the old
    empty-restart parity could never see."""
    from graphzeppelin_spark.streaming.driver import GraphStreamDriver

    ck = str(tmp_path / "drv_ck2")
    stream = _stream_df(
        spark,
        [(0, 0, 1, 2), (1, 0, 2, 3), (2, 0, 2, 1)],  # (1,2) re-inserted
    )
    drv = GraphStreamDriver(
        spark, stream, num_vertices=8, checkpoint_dir=ck, validate_stream=True
    )
    drv.process_stream_until(2)
    resumed = GraphStreamDriver.resume(
        spark, stream, checkpoint_dir=ck, validate_stream=True
    )
    with pytest.raises(Exception, match="double insert"):
        resumed.process_stream_until(3)


def test_checkpoint_commit_retry_idempotent(spark, tmp_path):
    """A crash between write_state and publish must not leave a later
    retried commit with duplicated/mixed snapshot rows (the snap id is
    reused — it was never published). Pins the protocol invariant the
    IcebergBackend fix (overwritePartitions, not append) restores; the
    parquet backend gets it from mode('overwrite')."""
    from graphzeppelin_spark.streaming.checkpoint import CheckpointStore

    root = str(tmp_path / "ck_retry")
    store = CheckpointStore(spark, root)
    df1 = spark.range(5).selectExpr("id as v", "id * 2 as val")

    real_publish = store.backend.publish
    def failing_publish(snap_id, meta):
        raise RuntimeError("simulated crash between write_state and publish")
    store.backend.publish = failing_publish
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.commit(df1, {"kind": "t"})
    store.backend.publish = real_publish

    df2 = spark.range(5).selectExpr("id as v", "id * 3 as val")  # retried content
    sid = store.commit(df2, {"kind": "t"})
    assert sid == 1  # reused the unpublished id
    got, _ = store.read()
    rows = {(r["v"], r["val"]) for r in got.collect()}
    assert rows == {(i, i * 3) for i in range(5)}  # no orphan df1 rows


def test_forest_add_presorted_merge_matches_union1d():
    """ADVICE r5 low: _forest_add must not re-sort the whole forest per
    batch; the searchsorted+insert merge must stay set-equivalent."""
    from graphzeppelin_spark.streaming.driver import GraphStreamDriver

    rng = np.random.default_rng(7)
    drv = GraphStreamDriver.__new__(GraphStreamDriver)  # only _forest needed
    drv._forest = np.empty(0, dtype=np.int64)
    oracle = np.empty(0, dtype=np.int64)
    for _ in range(20):
        batch = rng.integers(0, 10_000, rng.integers(0, 50), dtype=np.int64)
        drv._forest_add(batch)
        oracle = np.union1d(oracle, batch)
        assert np.array_equal(drv._forest, oracle)
        # sortedness invariant the binary-search probes rely on
        assert np.all(np.diff(drv._forest) > 0)


def test_distributed_cc_complete_labels_full_universe(spark):
    """Verdict r5 missing #1: the distributed path labeled state vertices
    only, so its component count silently disagreed with driver-DSU's
    full-universe count on any graph with untouched vertices (measured
    12,959 vs 2 at kron_17). complete=True unions the implicit singletons
    via a range anti-join — counts must now agree."""
    from graphzeppelin_spark.operators.sketch_cc import SketchCC

    n = 100
    edges = [(i, i + 1) for i in range(10, 20)]  # vertices 10..20 only
    stream = _stream_df(spark, [(i, 0, s, d) for i, (s, d) in enumerate(edges)])
    alg = SketchCC(spark, num_vertices=n, seed=11)
    state = alg.build_state(stream).persist()
    state.count()

    compact = alg.connected_components_distributed(state)
    assert compact.count() == 11  # state vertices only (back-compat default)

    full = alg.connected_components_distributed(state, complete=True)
    rows = {r["vertex"]: r["component"] for r in full.collect()}
    assert len(rows) == n  # every vertex in [0, n)
    # untouched vertices are their own components
    assert all(rows[v] == v for v in range(n) if not 10 <= v <= 20)
    # the chain 10..20 is one component
    assert len({rows[v] for v in range(10, 21)}) == 1
    # count parity with the driver-DSU full-universe labeling
    labels, _ = alg.boruvka(state)
    assert len(set(rows.values())) == len(np.unique(labels))
    state.unpersist()


def test_labelprop_resume_restores_partitioning(spark, tmp_path):
    # big_edges plan + mid-convergence stop, then resume: the resumed run
    # must converge to the identical labeling (and exercise the
    # repartition-on-resume branch, big_threshold=1 forces big_edges)
    arr = _ring_edges(40)
    ck = str(tmp_path / "lp_ck")
    partial = label_propagation_df(
        edges_df(spark, arr), max_iters=2, checkpoint_dir=ck, big_threshold=1
    )
    partial.count()
    resumed = label_propagation_df(
        edges_df(spark, arr), max_iters=30, checkpoint_dir=ck, big_threshold=1
    )
    rows = resumed.collect()
    assert all(r["label"] == 0 for r in rows) and len(rows) == 40


def test_hostmeter_steal_fraction_bounded():
    """hostmeter reads /proc/stat without error and reports a sane
    percentage (the contention covariate every bench record now carries)."""
    import time

    from graphzeppelin_spark.hostmeter import StealMeter, read_cpu_jiffies

    total, steal = read_cpu_jiffies()
    assert total >= steal >= 0
    m = StealMeter()
    time.sleep(0.3)
    pct = m.steal_pct()
    # None only on sub-tick windows / non-Linux; here 0.3s >> 1 jiffy
    assert pct is not None and 0.0 <= pct <= 100.0
    m.restart()
    pct2 = m.steal_pct()
    assert pct2 is None or 0.0 <= pct2 <= 100.0


def test_triad_probe_positive():
    from graphzeppelin_spark.hostmeter import triad_gbps

    g = triad_gbps(mb=32, reps=2)
    assert g is None or g > 0.1
