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
