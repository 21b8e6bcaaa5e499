"""Checkpoint store: resumable sketch/label state with per-partition lineage + metrics.

The Spark analog of the reference's write_binary / construct_from_serialized_data
(src/cc_sketch_alg.cpp:614-623, 30-64), upgraded to the north_rule requirements:
every committed snapshot carries (seed, num_vertices, variant, seq_watermark,
round) metadata plus per-partition row counts, so any job can resume
mid-stream or mid-convergence from the latest (or any) snapshot.

Storage is parquet directories under a root path, one per snapshot id, with a
JSON metadata sidecar — the same snapshot/lineage semantics an Iceberg table
would give (this sandbox has no Iceberg jars; the layout is deliberately
Iceberg-shaped: immutable snapshot dirs + metadata, atomically published by
writing the metadata file last).

Reference-checkpoint interchange: this engine deliberately CANNOT reheat a
reference write_binary file. The reference serializes GF(2)/XXH3 bucket
state; this engine's kernel is an independent re-derivation over Z/2^64
with splitmix64 hashing (sketch/kernel.py), so a reference bucket array is
not meaningful input here (and vice versa) — the two states are sketches of
the same stream under different hash families. Interchange happens at the
STREAM level, which both sides define identically: sources/stream.py reads
the reference's binary and ascii stream formats byte-compatibly, so any
reference workload replays into this engine and reaches an equivalent
(exactly-queryable) state."""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _snap_dir(self, snap_id: int) -> str:
        return os.path.join(self.root, f"snap-{snap_id:08d}")

    def latest_id(self) -> int | None:
        snaps = [
            int(d.split("-")[1])
            for d in os.listdir(self.root)
            if d.startswith("snap-")
            and os.path.exists(os.path.join(self.root, d, "metadata.json"))
        ]
        return max(snaps) if snaps else None

    def commit(self, state: DataFrame, metadata: dict[str, Any]) -> int:
        """Write a new snapshot; returns its id. Metadata file is written last
        so readers never observe a half-written snapshot.

        Exactly ONE Spark job per commit: the per-partition lineage metrics
        (north_rule) come from the written parquet files' footers — each
        write task produces one part-<taskid> file, so footer row counts ARE
        the per-partition counts — instead of a second aggregation job over
        the same state (which would double every commit's compute). Footer
        reads are driver-side metadata-only; at cluster scale with thousands
        of files they'd be fetched in parallel or read from the commit
        manifest an Iceberg writer returns."""
        snap_id = (self.latest_id() or 0) + 1
        d = self._snap_dir(snap_id)
        data_path = os.path.join(d, "state")
        state.write.mode("overwrite").parquet(data_path)
        part_metrics = self._footer_metrics(data_path)
        meta = dict(metadata)
        meta.update(
            {
                "snapshot_id": snap_id,
                "committed_at": time.time(),
                "partitions": part_metrics,
                # [] = footer listing unavailable (see _footer_metrics);
                # None distinguishes "unknown" from a genuinely empty state
                "total_rows": (
                    sum(p["rows"] for p in part_metrics) if part_metrics else None
                ),
            }
        )
        with open(os.path.join(d, "metadata.json"), "w") as f:
            json.dump(meta, f, indent=1)
        return snap_id

    @staticmethod
    def _footer_metrics(data_path: str) -> list[dict[str, int]]:
        """Per-partition row counts from parquet footers (no Spark job).
        Partition index = the task id embedded in the part file name.

        Assumes a local filesystem, the default 'part-NNNNN-…' committer
        naming, and one file per write task; EMPTY partitions write no file,
        so they appear with rows=0 only implicitly (absent from the list).
        On any listing/parse failure (non-local checkpoint dir, custom
        committer) returns [] — commit() then records totals-only metrics
        rather than failing the snapshot. A real Iceberg deployment gets
        these counts from the commit manifest instead (see module header)."""
        import pyarrow.parquet as pq

        metrics = []
        try:
            names = sorted(os.listdir(data_path))
        except OSError:
            return []
        for fn in names:
            if not fn.startswith("part-") or not fn.endswith(".parquet"):
                continue
            try:
                idx = int(fn.split("-")[1])
                rows = pq.ParquetFile(os.path.join(data_path, fn)).metadata.num_rows
            except (ValueError, IndexError, OSError):
                return []  # unrecognized naming/layout: totals-only fallback
            metrics.append({"partition": idx, "rows": int(rows)})
        return metrics

    def read(self, snap_id: int | None = None) -> tuple[DataFrame, dict[str, Any]]:
        sid = snap_id if snap_id is not None else self.latest_id()
        if sid is None:
            raise FileNotFoundError(f"no snapshots under {self.root}")
        d = self._snap_dir(sid)
        with open(os.path.join(d, "metadata.json")) as f:
            meta = json.load(f)
        df = self.spark.read.parquet(os.path.join(d, "state")).drop("_part")
        return df, meta
