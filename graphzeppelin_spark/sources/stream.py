"""Readers for the reference's on-disk edge-stream formats (README.md:57-81).

- binary: header <num_nodes: u32> <num_updates: u64>, then 9-byte records
  <type: u8> <src: u32> <dst: u32>, little-endian.
- ascii: first line "num_nodes num_updates", then lines "type src dst"
  (or "src dst" for cumulative files with has_types=False).

Both return (metadata, DataFrame(seq, type, src, dst)). Parsing is numpy-
vectorized. At test scale the file is decoded driver-side in one shot; the
100 TB path is the same decode in mapInPandas over fixed-size byte-range
splits (the record size is constant, so offsets are computable) — but at
that scale you would land the stream in parquet anyway (TESTDATA.md model).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

STREAM_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("type", T.IntegerType(), False),
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)


def write_binary_stream(path: str, num_nodes: int, stream: pd.DataFrame) -> None:
    """Write the reference's binary stream format from a (seq,type,src,dst) frame."""
    n = len(stream)
    rec = np.zeros(n, dtype=[("type", "u1"), ("src", "<u4"), ("dst", "<u4")])
    rec["type"] = stream["type"].to_numpy()
    rec["src"] = stream["src"].to_numpy()
    rec["dst"] = stream["dst"].to_numpy()
    with open(path, "wb") as f:
        f.write(np.uint32(num_nodes).tobytes())
        f.write(np.uint64(n).tobytes())
        f.write(rec.tobytes())


def read_binary_stream(
    spark: SparkSession, path: str
) -> tuple[dict, DataFrame]:
    with open(path, "rb") as f:
        head = f.read(12)
        num_nodes = int(np.frombuffer(head, dtype="<u4", count=1)[0])
        num_updates = int(np.frombuffer(head, dtype="<u8", count=1, offset=4)[0])
        rec = np.frombuffer(
            f.read(9 * num_updates),
            dtype=[("type", "u1"), ("src", "<u4"), ("dst", "<u4")],
        )
    pdf = pd.DataFrame(
        {
            "seq": np.arange(num_updates, dtype=np.int64),
            "type": rec["type"].astype(np.int32),
            "src": rec["src"].astype(np.int64),
            "dst": rec["dst"].astype(np.int64),
        }
    )
    meta = {"num_nodes": num_nodes, "num_updates": num_updates}
    return meta, spark.createDataFrame(pdf, schema=STREAM_SCHEMA)


def write_ascii_stream(
    path: str, num_nodes: int, stream: pd.DataFrame, has_types: bool = True
) -> None:
    cols = ["type", "src", "dst"] if has_types else ["src", "dst"]
    with open(path, "w") as f:
        f.write(f"{num_nodes} {len(stream)}\n")
        stream[cols].to_csv(f, sep=" ", header=False, index=False)


def read_ascii_stream(
    spark: SparkSession, path: str, has_types: bool = True
) -> tuple[dict, DataFrame]:
    with open(path) as f:
        first = f.readline().split()
        num_nodes, num_updates = int(first[0]), int(first[1])
        body = pd.read_csv(
            f,
            sep=r"\s+",
            header=None,
            names=["type", "src", "dst"] if has_types else ["src", "dst"],
        )
    if not has_types:
        body.insert(0, "type", 0)
    pdf = pd.DataFrame(
        {
            "seq": np.arange(len(body), dtype=np.int64),
            "type": body["type"].astype(np.int32),
            "src": body["src"].astype(np.int64),
            "dst": body["dst"].astype(np.int64),
        }
    )
    meta = {"num_nodes": num_nodes, "num_updates": num_updates}
    return meta, spark.createDataFrame(pdf, schema=STREAM_SCHEMA)
