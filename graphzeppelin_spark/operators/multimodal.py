"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media payloads are opaque `binary` columns with typed metadata structs; the
compute ops (decode, feature-extract, resize, frame-sample) run as
Arrow-batched mapInPandas UDFs so each task touches a columnar batch of blobs
without per-row Python overhead.

IMPORTANT: this container ships no image/audio codecs, so the *decode* step is
a clearly-marked deterministic stub (`_stub_decode_*`): it parses a tiny fake
header (magic + width/height/duration) and derives features from raw bytes.
The Spark-side contract — schemas, partitioning, UDF signatures, batch shapes,
null handling — is real and tested; swapping the stub for PIL/ffmpeg changes
only the function body.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC_IMG = b"FIMG"
MAGIC_AUD = b"FAUD"

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def encode_fake_image(media_id: int, width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image blob: FIMG header + width/height + payload."""
    rng = np.random.default_rng(seed + media_id)
    payload = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return MAGIC_IMG + struct.pack("<II", width, height) + payload


def decode_image_meta(media: DataFrame, blob_col: str = "blob") -> DataFrame:
    """(media_id, width, height, n_bytes, mean_byte, valid) per blob.

    STUB decode: parses the fake FIMG header. A real deployment replaces the
    body with `PIL.Image.open(io.BytesIO(b))` — same schema, same batching.
    """

    def _decode(batches):
        for pdf in batches:
            ids, ws, hs, nb, mb, ok = [], [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf[blob_col]):
                ids.append(mid)
                nb.append(len(b) if b is not None else 0)
                if b is None or len(b) < 12 or bytes(b[:4]) != MAGIC_IMG:
                    ws.append(None); hs.append(None); mb.append(None); ok.append(False)
                    continue
                w, h = struct.unpack("<II", bytes(b[4:12]))
                payload = np.frombuffer(b, dtype=np.uint8, offset=12)
                ws.append(int(w)); hs.append(int(h))
                mb.append(float(payload.mean()) if len(payload) else None)
                ok.append(len(payload) == w * h)
            yield pd.DataFrame(
                {
                    "media_id": ids, "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"), "n_bytes": nb,
                    "mean_byte": pd.array(mb, dtype="float64"), "valid": ok,
                }
            )

    return media.select("media_id", blob_col).mapInPandas(_decode, schema=IMAGE_META_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, out_w: int, out_h: int, blob_col: str = "blob") -> DataFrame:
    """Nearest-neighbor resample of the fake payload grid — demonstrates a
    blob -> blob transform with bounded memory per batch. Real impl: PIL."""

    def _resize(batches):
        for pdf in batches:
            ids, blobs = [], []
            for mid, b in zip(pdf["media_id"], pdf[blob_col]):
                ids.append(mid)
                if b is None or len(b) < 12 or bytes(b[:4]) != MAGIC_IMG:
                    blobs.append(None)
                    continue
                w, h = struct.unpack("<II", bytes(b[4:12]))
                img = np.frombuffer(b, dtype=np.uint8, offset=12).reshape(h, w)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                out = img[yi][:, xi]
                blobs.append(MAGIC_IMG + struct.pack("<II", out_w, out_h) + out.tobytes())
            yield pd.DataFrame({"media_id": ids, "blob": blobs})

    return media.select("media_id", blob_col).mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(
    media: DataFrame, every_n: int = 10, frame_bytes: int = 64, blob_col: str = "blob"
) -> DataFrame:
    """1:N row explode of a 'video' blob into frame blobs (stride sampling).
    Real impl: ffmpeg keyframe extraction — same 1-to-many Arrow shape."""

    def _frames(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf[blob_col]):
                if b is None:
                    continue
                n_frames = max(len(b) // frame_bytes, 0)
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(b[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": frames}
            )

    return media.select("media_id", blob_col).mapInPandas(_frames, schema=FRAME_SCHEMA)
