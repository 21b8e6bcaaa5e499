"""Migrate a reference deployment into this engine: replay a reference
on-disk edge stream into an engine checkpoint snapshot.

The reference's `write_binary` sketch checkpoint is deliberately NOT
consumable (different sketch algebra — see streaming/checkpoint.py); its
STREAM files are, byte-for-byte (sources/stream.py mirrors the formats at
reference README.md:57-81). This tool closes the interchange gap at the
documented stream level: a long-running reference deployment replays its
stream once, lands an engine snapshot + seq watermark, and resumes here with
GraphStreamDriver.resume().

Usage:
    python scripts/import_reference_stream.py STREAM_FILE CHECKPOINT_DIR \
        [--format binary|ascii] [--upto SEQ] [--batch-size N] [--cores N]

Prints one JSON line: {num_nodes, num_updates, seq_watermark, snapshots, sec}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def import_stream(
    spark,
    stream_path: str,
    checkpoint_dir: str,
    fmt: str = "binary",
    upto: int | None = None,
    batch_size: int | None = None,
) -> dict:
    """Replay `stream_path` (reference format) into `checkpoint_dir`; returns
    a summary dict. Importable for tests; the CLI wraps it."""
    from graphzeppelin_spark.sources.stream import read_ascii_stream, read_binary_stream
    from graphzeppelin_spark.streaming.driver import GraphStreamDriver

    reader = read_binary_stream if fmt == "binary" else read_ascii_stream
    meta, stream = reader(spark, stream_path)
    target = meta["num_updates"] if upto is None else min(upto, meta["num_updates"])
    t0 = time.time()
    drv = GraphStreamDriver(
        spark,
        stream,
        num_vertices=meta["num_nodes"],
        checkpoint_dir=checkpoint_dir,
        eager=False,  # import is ingest-only; the first resume query reheats
    )
    drv.process_stream_until(target, batch_size=batch_size)
    return {
        "num_nodes": meta["num_nodes"],
        "num_updates": meta["num_updates"],
        "seq_watermark": target,
        "snapshots": drv.store.latest_id(),
        "sec": round(time.time() - t0, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("stream_file")
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--format", choices=["binary", "ascii"], default="binary")
    ap.add_argument("--upto", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from graphzeppelin_spark import get_spark

    spark = get_spark(app_name="import_reference_stream", cores=args.cores)
    summary = import_stream(
        spark,
        args.stream_file,
        args.checkpoint_dir,
        fmt=args.format,
        upto=args.upto,
        batch_size=args.batch_size,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
