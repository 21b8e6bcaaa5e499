"""Multimodal (image/audio/video) columns for training-data pipelines.

Media payloads are opaque `binary` columns; the compute ops (decode,
feature-extract, resize, frame-sample) run as Arrow-batched mapInPandas UDFs
so each task receives a columnar batch of blobs. All codecs are REAL and
stdlib-only — no PIL/ffmpeg dependency:

- PNG (images): zlib + struct + numpy. The decoder walks the chunk stream
  (CRC-verified), inflates the IDAT payload, and un-applies all five PNG
  scanline filters; 8-bit grayscale and RGB, non-interlaced — the subset the
  encoder emits and the common case for ML thumbnails. Per-pixel work is
  numpy (filters 0/1/2 fully vectorized per scanline; 3/4 use the spec's
  sequential recurrence) and decompression is C-level zlib; Python touches
  each *blob* once, never each pixel.
- WAV (audio): stdlib `wave`, PCM16; sample statistics via numpy.
- video: a length-prefixed container of PNG frames (`FVID`). Frame sampling
  parses the container and slices frame blobs out without decoding pixels —
  an ffmpeg keyframe extractor would slot behind the same 1-to-many
  mapInPandas shape.

Scale notes: every op column-prunes to (media_id, blob) before the UDF, so
untouched metadata never crosses Arrow; batches are bounded by
spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob count; a
corrupt blob yields a valid=false row instead of failing the task (a 100 TB
crawl always contains garbage).

Reference scope note: the reference engine (GraphZeppelin) has no media
pipeline — this module is part of the LLM-training-data suite layered on the
same engine.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_VID_MAGIC = b"FVID"


# ----------------------------------------------------------------- PNG codec


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an 8-bit grayscale (h, w) or RGB (h, w, 3) array as a PNG
    (filter type 0 scanlines, one IDAT chunk)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color, ch = 0, 1
        flat = px
    elif px.ndim == 3 and px.shape[2] == 3:
        color, ch = 2, 3
        flat = px.reshape(px.shape[0], px.shape[1] * 3)
    else:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB uint8")
    h, w = px.shape[0], px.shape[1]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = np.hstack([np.zeros((h, 1), np.uint8), flat]).tobytes()
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> np.ndarray:
    """Decode a PNG to a uint8 array: (h, w) for grayscale, (h, w, 3) for RGB.

    Real decoder: CRC-checked chunk walk, zlib inflate, and full scanline
    unfiltering (types 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth). Supports
    bit depth 8, color types 0/2, interlace 0 — raises ValueError otherwise.
    """
    b = bytes(b)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, hdr = 8, [], None
    while pos + 12 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", b, pos + 8 + ln)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        pos += 12 + ln
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = hdr
    if depth != 8 or color not in (0, 2) or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth} color={color} interlace={interlace})")
    ch = 1 if color == 0 else 3
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for r in range(h):
        row = rows[r, 1:].astype(np.int32)
        f = int(ftypes[r])
        if f == 0:  # None
            rec = row
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-ch]  → per-channel cumsum
            rec = (
                np.cumsum(row.reshape(w, ch), axis=0, dtype=np.int64).reshape(stride)
                & 255
            ).astype(np.int32)
        elif f == 2:  # Up
            rec = (row + prev) & 255
        elif f == 3:  # Average (sequential recurrence per the spec)
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (row[x] + ((left + prev[x]) >> 1)) & 255
        elif f == 4:  # Paeth (sequential recurrence per the spec)
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                up = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = (row[x] + pred) & 255
        else:
            raise ValueError(f"bad filter type {f}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


# ----------------------------------------------------------------- WAV codec


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode a mono int16 sample array as a PCM16 WAV blob (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def decode_wav(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """(sample_rate, n_channels, n_frames, samples int16) from a WAV blob."""
    with wave.open(io.BytesIO(bytes(b)), "rb") as wv:
        rate, nch, nframes = wv.getframerate(), wv.getnchannels(), wv.getnframes()
        if wv.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        data = np.frombuffer(wv.readframes(nframes), np.int16)
    return rate, nch, nframes, data


# ------------------------------------------------------------ video container


def encode_video(frames: list[np.ndarray]) -> bytes:
    """FVID container: magic + frame count + length-prefixed PNG frames."""
    parts = [_VID_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        png = encode_png(fr)
        parts.append(struct.pack("<I", len(png)))
        parts.append(png)
    return b"".join(parts)


def _iter_video_frames(b: bytes):
    """Yield (frame_idx, png_bytes) without decoding pixels."""
    b = bytes(b)
    if b[:4] != _VID_MAGIC or len(b) < 8:
        raise ValueError("not an FVID container")
    (n,) = struct.unpack_from("<I", b, 4)
    pos = 8
    for i in range(n):
        (ln,) = struct.unpack_from("<I", b, pos)
        pos += 4
        frame = b[pos : pos + ln]
        if len(frame) != ln:  # python slicing never raises — check explicitly
            raise ValueError("truncated frame payload")
        yield i, frame
        pos += ln


# ------------------------------------------------------------- Spark operators

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_px", T.DoubleType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def decode_image_meta(media: DataFrame, blob_col: str = "blob") -> DataFrame:
    """(media_id, width, height, channels, n_bytes, mean_px, valid) per blob
    — real PNG decode; corrupt/non-PNG blobs yield valid=false rows."""

    def _decode(batches):
        for pdf in batches:
            n = len(pdf)
            nb = pdf[blob_col].map(lambda b: len(b) if b is not None else 0)
            ws = np.full(n, -1, np.int64)
            hs = np.full(n, -1, np.int64)
            cs = np.full(n, -1, np.int64)
            mp = np.full(n, np.nan)
            ok = np.zeros(n, bool)
            for i, b in enumerate(pdf[blob_col]):
                if b is None:
                    continue
                try:
                    px = decode_png(b)
                except (ValueError, zlib.error, struct.error):
                    continue
                hs[i], ws[i] = px.shape[0], px.shape[1]
                cs[i] = 1 if px.ndim == 2 else px.shape[2]
                mp[i] = float(px.mean())
                ok[i] = True
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": pd.array(np.where(ok, ws, None), dtype="Int32"),
                    "height": pd.array(np.where(ok, hs, None), dtype="Int32"),
                    "channels": pd.array(np.where(ok, cs, None), dtype="Int32"),
                    "n_bytes": nb.to_numpy(np.int64),
                    # NULL (not NaN) for invalid rows, matching the Int32
                    # columns' convention — NaN would poison avg/sum and
                    # compare NaN=NaN true in Spark SQL
                    "mean_px": pd.array(np.where(ok, mp, None), dtype="Float64"),
                    "valid": ok,
                }
            )

    return media.select("media_id", blob_col).mapInPandas(_decode, schema=IMAGE_META_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mean_px", T.DoubleType(), True),
        T.StructField("std_px", T.DoubleType(), True),
        T.StructField("histogram", T.ArrayType(T.DoubleType()), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def image_features(media: DataFrame, n_bins: int = 8, blob_col: str = "blob") -> DataFrame:
    """Per-image feature vector: mean, std, and an n_bins intensity histogram
    (normalized) — the decode→embed feature-extraction stage; the numpy body
    is where a vision encoder would run."""

    def _feat(batches):
        for pdf in batches:
            ids, means, stds, hists, ok = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf[blob_col]):
                ids.append(mid)
                try:
                    px = decode_png(b) if b is not None else None
                    if px is None:
                        raise ValueError
                except (ValueError, zlib.error, struct.error):
                    means.append(None)
                    stds.append(None)
                    hists.append(None)
                    ok.append(False)
                    continue
                flat = px.reshape(-1).astype(np.float64)
                hist, _ = np.histogram(flat, bins=n_bins, range=(0, 256))
                means.append(float(flat.mean()))
                stds.append(float(flat.std()))
                hists.append((hist / max(flat.size, 1)).tolist())
                ok.append(True)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    # nullable Float64: None must reach Spark as NULL, not NaN
                    "mean_px": pd.array(means, dtype="Float64"),
                    "std_px": pd.array(stds, dtype="Float64"),
                    "histogram": hists,
                    "valid": ok,
                }
            )

    return media.select("media_id", blob_col).mapInPandas(_feat, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, out_w: int, out_h: int, blob_col: str = "blob") -> DataFrame:
    """PNG → PNG nearest-neighbor resize (numpy index grids); invalid blobs
    pass through as null."""

    def _resize(batches):
        for pdf in batches:
            ids, blobs = [], []
            for mid, b in zip(pdf["media_id"], pdf[blob_col]):
                ids.append(mid)
                try:
                    px = decode_png(b) if b is not None else None
                    if px is None:
                        raise ValueError
                except (ValueError, zlib.error, struct.error):
                    blobs.append(None)
                    continue
                h, w = px.shape[0], px.shape[1]
                yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                blobs.append(encode_png(px[yi][:, xi]))
            yield pd.DataFrame({"media_id": ids, "blob": blobs})

    return media.select("media_id", blob_col).mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10, blob_col: str = "blob") -> DataFrame:
    """1:N explode of an FVID video blob into its PNG frames, stride-sampled
    (every_n). Container parse only — no pixel decode; corrupt containers
    contribute zero rows."""

    def _frames(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf[blob_col]):
                if b is None:
                    continue
                # buffer per blob: a container truncated mid-frame must
                # contribute ZERO rows, not the frames before the corruption
                b_ids, b_idxs, b_frames = [], [], []
                try:
                    for i, png in _iter_video_frames(b):
                        if i % every_n == 0:
                            b_ids.append(mid)
                            b_idxs.append(i)
                            b_frames.append(png)
                except (ValueError, struct.error):
                    continue
                ids.extend(b_ids)
                idxs.extend(b_idxs)
                frames.extend(b_frames)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": pd.array(idxs, dtype="int32"), "frame": frames}
            )

    return media.select("media_id", blob_col).mapInPandas(_frames, schema=FRAME_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("valid", T.BooleanType(), False),
    ]
)


def decode_audio_meta(media: DataFrame, blob_col: str = "blob") -> DataFrame:
    """(media_id, sample_rate, n_channels, n_frames, duration_sec, rms, valid)
    — real WAV decode via stdlib wave; rms over int16 samples in numpy."""

    def _decode(batches):
        for pdf in batches:
            ids, rates, chans, frames, durs, rmss, ok = [], [], [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf[blob_col]):
                ids.append(mid)
                try:
                    rate, nch, nf, data = decode_wav(b) if b is not None else (None,) * 4
                    if rate is None:
                        raise ValueError
                except (ValueError, wave.Error, EOFError, struct.error):
                    rates.append(None)
                    chans.append(None)
                    frames.append(None)
                    durs.append(None)
                    rmss.append(None)
                    ok.append(False)
                    continue
                rates.append(rate)
                chans.append(nch)
                frames.append(nf)
                durs.append(nf / rate if rate else None)
                rmss.append(
                    float(np.sqrt(np.mean(data.astype(np.float64) ** 2))) if data.size else 0.0
                )
                ok.append(True)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_channels": pd.array(chans, dtype="Int32"),
                    "n_frames": pd.array(frames, dtype="Int64"),
                    "duration_sec": pd.array(durs, dtype="float64"),
                    "rms": pd.array(rmss, dtype="float64"),
                    "valid": ok,
                }
            )

    return media.select("media_id", blob_col).mapInPandas(_decode, schema=AUDIO_META_SCHEMA)
