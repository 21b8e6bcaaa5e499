"""Live-mode kron bench (round-6 verdict next-round #7).

LiveGraphStream (Structured Streaming readStream -> foreachBatch -> sketch
state) was pytest-scale only; this folds a real kron stream through the live
path in waves of parquet files appearing in the source directory, with two
mid-stream CC queries, one checkpoint-restart mid-stream, and an oracle
check of every answer:

- kron_15 (2.2M updates): every mid-stream CC is checked against the exact
  numpy oracle on the stream prefix, and the final live labels are compared
  to the batch path (build_state over the whole stream + boruvka) — the
  live fold and the batch replay must agree exactly.
- kron_17 (31.6M updates, SPARK_GRAFT_LIVE_17=1): throughput record; final
  label parity vs the batch path.

Writes BENCH/live_kron.json: per-wave wall time + updates/s, mid-stream
component counts, resume evidence (fresh instance restoring from the state
snapshot and continuing the stream checkpoint).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from graphzeppelin_spark import get_spark, oracle  # noqa: E402
from graphzeppelin_spark.hostmeter import StealMeter  # noqa: E402
from graphzeppelin_spark.operators.sketch_cc import SketchCC  # noqa: E402
from graphzeppelin_spark.sources.generators import kron_stream  # noqa: E402
from graphzeppelin_spark.streaming.live import LiveGraphStream  # noqa: E402

WAVES = 4  # file waves; restart happens before the last one


def run_scale(spark, scale: int, ef: int, oracle_checked: bool) -> dict:
    n = 1 << scale
    pdf = kron_stream(scale=scale, edge_factor=ef, seed=42)
    n_updates = len(pdf)
    base = f"/tmp/gz_live_kron_{scale}"
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    os.makedirs(src)
    stream_ckpt = os.path.join(base, "stream_ckpt")
    state_ckpt = os.path.join(base, "state_ckpt")

    # pre-cut the stream into WAVES seq-contiguous parquet files
    cuts = np.linspace(0, n_updates, WAVES + 1, dtype=np.int64)
    wave_files = []
    for i in range(WAVES):
        part = pdf.iloc[cuts[i]:cuts[i + 1]]
        path = os.path.join(base, f"wave_{i}.parquet")
        part.to_parquet(path)
        wave_files.append((path, len(part), int(cuts[i + 1])))

    out: dict = {"scale": scale, "edge_factor": ef, "n_updates": int(n_updates),
                 "waves": []}
    live = LiveGraphStream(spark, src, num_vertices=n,
                           stream_checkpoint_dir=stream_ckpt,
                           state_checkpoint_dir=state_ckpt, seed=42)

    def fold_wave(lv, i):
        path, n_up, prefix = wave_files[i]
        shutil.copy(path, os.path.join(src, f"wave_{i}.parquet"))
        meter = StealMeter()
        t0 = time.time()
        lv.process_available()
        wall = time.time() - t0
        w = {"wave": i, "updates": n_up, "wall_sec": round(wall, 2),
             "updates_per_sec": round(n_up / wall, 1),
             "steal_pct": meter.steal_pct(), "prefix": prefix}
        out["waves"].append(w)
        print(json.dumps(w), file=sys.stderr, flush=True)
        return prefix

    # waves 0-1 + mid-stream CC #1
    fold_wave(live, 0)
    prefix = fold_wave(live, 1)
    t0 = time.time()
    labels1 = live.connected_components()
    out["midstream_cc1_sec"] = round(time.time() - t0, 2)
    out["midstream_cc1_components"] = int(len(np.unique(labels1)))
    if oracle_checked:
        exp = oracle.connected_components(
            oracle.live_edges(pdf.iloc[:prefix], n), n)
        np.testing.assert_array_equal(labels1, exp)
        out["midstream_cc1_oracle"] = "exact-match"

    # wave 2 + mid-stream CC #2
    prefix = fold_wave(live, 2)
    t0 = time.time()
    labels2 = live.connected_components()
    out["midstream_cc2_sec"] = round(time.time() - t0, 2)
    out["midstream_cc2_components"] = int(len(np.unique(labels2)))
    if oracle_checked:
        exp = oracle.connected_components(
            oracle.live_edges(pdf.iloc[:prefix], n), n)
        np.testing.assert_array_equal(labels2, exp)
        out["midstream_cc2_oracle"] = "exact-match"

    # RESTART: fresh instance must restore state + continue the stream
    # checkpoint (already-committed waves are skipped, not re-folded)
    if live.state is not None:
        live.state.unpersist()
    t0 = time.time()
    live2 = LiveGraphStream(spark, src, num_vertices=n,
                            stream_checkpoint_dir=stream_ckpt,
                            state_checkpoint_dir=state_ckpt, seed=42)
    out["resume_restore_sec"] = round(time.time() - t0, 2)
    out["resume_restored_batches"] = live2.batches_seen
    fold_wave(live2, 3)

    t0 = time.time()
    labels_live = live2.connected_components()
    out["final_cc_sec"] = round(time.time() - t0, 2)
    out["final_components"] = int(len(np.unique(labels_live)))

    # batch-path parity: one-shot build_state over the full stream
    alg = SketchCC(spark, num_vertices=n, seed=42)
    full = spark.createDataFrame(pdf)
    t0 = time.time()
    state = alg.build_state(full).persist()
    state.count()
    out["batch_ingest_sec"] = round(time.time() - t0, 2)
    labels_batch, _ = alg.boruvka(state)
    state.unpersist()
    np.testing.assert_array_equal(labels_live, labels_batch)
    out["live_equals_batch_labels"] = True
    if oracle_checked:
        exp = oracle.connected_components(oracle.live_edges(pdf, n), n)
        np.testing.assert_array_equal(labels_live, exp)
        out["final_oracle"] = "exact-match"

    if live2.state is not None:
        live2.state.unpersist()
    shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    spark = get_spark(app_name="gz_live_kron", cores=32, shuffle_partitions=64)
    out = {"kron_15": run_scale(spark, 15, 64, oracle_checked=True)}
    if os.environ.get("SPARK_GRAFT_LIVE_17", "1") == "1":
        out["kron_17"] = run_scale(spark, 17, 256, oracle_checked=False)
    with open(os.path.join(REPO, "BENCH", "live_kron.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "waves"}
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
