"""Real-codec multimodal operators: PNG decode (all filters), WAV, FVID."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from graphzeppelin_spark.operators.multimodal import (
    decode_audio_meta,
    decode_image_meta,
    decode_png,
    decode_wav,
    encode_png,
    encode_video,
    encode_wav,
    image_features,
    resize_images,
    sample_frames,
)


def _gradient(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def test_png_roundtrip_gray_and_rgb():
    gray = _gradient(13, 17, seed=1)
    np.testing.assert_array_equal(decode_png(encode_png(gray)), gray)
    rgb = np.stack([_gradient(9, 11, seed=i) for i in range(3)], axis=-1)
    np.testing.assert_array_equal(decode_png(encode_png(rgb)), rgb)


def _png_with_filters(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Build a PNG whose scanline r uses filter ftypes[r] — an independent
    spec-faithful filterer, so the decoder's unfiltering is tested against
    the RFC 2083 definitions rather than against itself."""
    h, w = px.shape
    ch = 1
    raw = bytearray()
    prev = np.zeros(w, np.int32)
    for r in range(h):
        row = px[r].astype(np.int32)
        f = ftypes[r]
        raw.append(f)
        for x in range(w):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - a
            elif f == 2:
                v = row[x] - b
            elif f == 3:
                v = row[x] - ((a + b) >> 1)
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[x] - pred
            raw.append(v & 255)
        prev = row

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_handles_all_filter_types():
    px = _gradient(10, 24, seed=3)
    blob = _png_with_filters(px, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    np.testing.assert_array_equal(decode_png(blob), px)


def test_png_crc_corruption_detected():
    blob = bytearray(encode_png(_gradient(6, 6)))
    blob[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises((ValueError, zlib.error)):
        decode_png(bytes(blob))


def test_decode_image_meta(spark):
    imgs = {i: _gradient(8 + i, 16 + i, seed=i) for i in range(5)}
    rows = [(i, encode_png(img)) for i, img in imgs.items()]
    rows.append((98, None))
    rows.append((99, b"NOTAPNG" * 4))
    media = spark.createDataFrame(rows, "media_id long, blob binary")
    meta = decode_image_meta(media).toPandas().set_index("media_id")
    for i, img in imgs.items():
        assert meta.loc[i, "width"] == 16 + i and meta.loc[i, "height"] == 8 + i
        assert meta.loc[i, "channels"] == 1
        assert abs(meta.loc[i, "mean_px"] - img.mean()) < 1e-9
        assert bool(meta.loc[i, "valid"])
    assert not bool(meta.loc[98, "valid"]) and not bool(meta.loc[99, "valid"])
    assert meta.loc[99].isna()["width"]


def test_image_features(spark):
    img = _gradient(32, 32, seed=7)
    media = spark.createDataFrame([(1, encode_png(img))], "media_id long, blob binary")
    feat = image_features(media, n_bins=8).toPandas().iloc[0]
    assert abs(feat["mean_px"] - img.mean()) < 1e-9
    assert abs(feat["std_px"] - img.std()) < 1e-9
    assert abs(sum(feat["histogram"]) - 1.0) < 1e-9
    expected_hist, _ = np.histogram(img.reshape(-1), bins=8, range=(0, 256))
    np.testing.assert_allclose(feat["histogram"], expected_hist / img.size)


def test_resize_images(spark):
    img = np.repeat(np.repeat(_gradient(4, 4, seed=9), 4, axis=0), 4, axis=1)  # 16x16 blocks
    rows = [(1, encode_png(img)), (2, b"garbage")]
    media = spark.createDataFrame(rows, "media_id long, blob binary")
    out = {r["media_id"]: r["blob"] for r in resize_images(media, 4, 4).collect()}
    # nearest-neighbor downsample of a 4x-blocked image recovers the blocks
    np.testing.assert_array_equal(decode_png(out[1]), img[::4, ::4])
    assert out[2] is None


def test_video_frame_sampling(spark):
    frames = [_gradient(6, 6, seed=i) for i in range(25)]
    media = spark.createDataFrame(
        [(1, encode_video(frames)), (2, b"notavideo")], "media_id long, blob binary"
    )
    got = sample_frames(media, every_n=10).collect()
    assert [f["frame_idx"] for f in got] == [0, 10, 20]
    for f in got:
        np.testing.assert_array_equal(decode_png(f["frame"]), frames[f["frame_idx"]])


def test_truncated_video_contributes_zero_rows(spark):
    """A container cut off mid-frame must yield NO rows for that blob (not
    the frames before the truncation point) — partial frame sets would read
    as complete downstream."""
    frames = [_gradient(6, 6, seed=i) for i in range(25)]
    blob = encode_video(frames)
    truncated = blob[: len(blob) // 2]  # valid header, body cut mid-frame
    media = spark.createDataFrame(
        [(1, truncated), (2, encode_video(frames[:5]))], "media_id long, blob binary"
    )
    got = sample_frames(media, every_n=2).collect()
    assert {f["media_id"] for f in got} == {2}
    assert [f["frame_idx"] for f in got] == [0, 2, 4]


def test_wav_roundtrip_and_audio_meta(spark):
    t = np.arange(4000)
    samples = (1000 * np.sin(2 * np.pi * 440 * t / 16000)).astype(np.int16)
    blob = encode_wav(samples, sample_rate=16000)
    rate, nch, nf, data = decode_wav(blob)
    assert (rate, nch, nf) == (16000, 1, 4000)
    np.testing.assert_array_equal(data, samples)
    media = spark.createDataFrame(
        [(1, blob), (2, b"notawav"), (3, None)], "media_id long, blob binary"
    )
    meta = decode_audio_meta(media).toPandas().set_index("media_id")
    assert meta.loc[1, "sample_rate"] == 16000
    assert meta.loc[1, "n_frames"] == 4000
    assert abs(meta.loc[1, "duration_sec"] - 0.25) < 1e-12
    expected_rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    assert abs(meta.loc[1, "rms"] - expected_rms) < 1e-9
    assert not bool(meta.loc[2, "valid"]) and not bool(meta.loc[3, "valid"])
