"""Multimodal plumbing tests: schema, batch shape, determinism of the stubbed
decode kernels (real Spark path — mapInPandas over binary + struct columns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.multimodal import (
    extract_media_features,
    resize_images,
    sample_video_frames,
    synth_media,
)


def test_extract_media_features(spark):
    media = synth_media(spark, n=30)
    out = extract_media_features(media)
    rows = out.collect()
    assert len(rows) == 30
    r = rows[0]
    assert len(r["embedding"]) == 16
    assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-9  # unit norm
    assert len(r["payload_sha"]) == 64
    # determinism across runs
    again = {x["media_id"]: x["embedding"] for x in extract_media_features(media).collect()}
    assert again[r["media_id"]] == r["embedding"]


def test_resize_images_only_images(spark):
    media = synth_media(spark, n=30)
    out = resize_images(media, 64, 64).collect()
    assert all(r["kind"] == "image" for r in out)
    assert len(out) == 10
    # dimension-dependent output
    out2 = resize_images(media, 32, 32).collect()
    assert out[0]["payload"] != out2[0]["payload"]


def test_sample_video_frames_fanout(spark):
    media = synth_media(spark, n=30)
    out = sample_video_frames(media, every_ms=1000)
    rows = out.collect()
    assert all(0 <= r["frame_index"] and r["ts_ms"] % 1000 == 0 for r in rows)
    per_video = {}
    for r in rows:
        per_video.setdefault(r["media_id"], []).append(r["frame_index"])
    # 3-6s videos at 1fps → 3-6 frames each, contiguous indices
    for frames in per_video.values():
        assert sorted(frames) == list(range(len(frames)))
        assert 3 <= len(frames) <= 6


def test_real_decode_is_marked_unimplemented(spark):
    media = synth_media(spark, n=3)
    with pytest.raises(Exception):
        extract_media_features(media, decode_stub=False).collect()


def test_raw8_resize_golden(spark):
    """Real nearest-neighbor math: 4x2 image to 2x1 picks the exact pixels
    src_i = floor((dst_i + 0.5) * src/dst)."""
    payload = bytes([10, 20, 30, 40,
                     50, 60, 70, 80])
    media = spark.createDataFrame(
        [("img", "image", payload,
          {"width": 4, "height": 2, "duration_ms": None, "codec": "raw8"})],
        "media_id string, kind string, payload binary, "
        "meta struct<width:int, height:int, duration_ms:int, codec:string>",
    )
    out = resize_images(media, width=2, height=1).collect()[0]
    # rows: dst 0 -> src floor(0.5*2)=1; cols: dst 0 -> floor(0.5*2)=1? No:
    # col index = floor((d+0.5)*4/2) = floor(1.0)=1, floor(3.0)=3
    assert list(out["payload"]) == [60, 80]


def test_raw8_frame_sampling_slices_stored_frames(spark):
    w, h, secs = 2, 2, 3
    frames = [bytes([i] * (w * h)) for i in range(secs)]
    media = spark.createDataFrame(
        [("vid", "video", b"".join(frames),
          {"width": w, "height": h, "duration_ms": secs * 1000, "codec": "raw8"})],
        "media_id string, kind string, payload binary, "
        "meta struct<width:int, height:int, duration_ms:int, codec:string>",
    )
    rows = sorted(
        sample_video_frames(media, every_ms=1000).collect(),
        key=lambda r: r["frame_index"],
    )
    assert len(rows) == 3
    # ts 0/1000/2000 map to stored frames 0/1/2; emitted bytes ARE the frames
    for i, r in enumerate(rows):
        assert list(r["frame"]) == [i] * (w * h)


def test_raw8_features_are_real_histograms(spark):
    from entity_resolution_spark.operators.multimodal import synth_raw8_media

    media = synth_raw8_media(spark, n=10)
    # raw8 never hits the stub: decode_stub=False must NOT raise
    rows = extract_media_features(media, decode_stub=False).collect()
    assert len(rows) == 10
    for r in rows:
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-9
    # a constant image has all mass in one bin
    const = spark.createDataFrame(
        [("c", "image", bytes([255] * 48),
          {"width": 8, "height": 6, "duration_ms": None, "codec": "raw8"})],
        "media_id string, kind string, payload binary, "
        "meta struct<width:int, height:int, duration_ms:int, codec:string>",
    )
    emb = extract_media_features(const).collect()[0]["embedding"]
    assert emb[-1] == 1.0 and sum(emb[:-1]) == 0.0


# --- PNG tier (REAL stdlib decode) -----------------------------------------


def _encode_png(px, color_type=0, filters=None):
    """Minimal PNG ENCODER for the goldens: forward-filters each scanline
    with a chosen filter type (None/Sub/Up/Average/Paeth — the spec's §6
    forward transforms, the independent inverse of the decoder under test),
    deflates, and frames the IHDR/IDAT/IEND chunks with real CRCs."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    filters = filters or [0] * h
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int64)
        enc = np.empty(stride, np.int64)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_pixel_golden_all_filters():
    """Round-trip golden: every PNG filter type must reconstruct the exact
    pixel matrix (the encoder applies the spec's forward transforms — the
    independent inverse of the decoder's unfiltering)."""
    import numpy as np

    from entity_resolution_spark.operators.multimodal import _decode_png

    rng = np.random.RandomState(31)
    px = rng.randint(0, 256, size=(5, 7), dtype=np.uint8)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5, [0, 1, 2, 3, 4]):
        got = _decode_png(_encode_png(px, 0, filters))
        assert got is not None and (got == px).all(), filters


def test_png_decode_rgb_luma_and_malformed():
    import numpy as np

    from entity_resolution_spark.operators.multimodal import _decode_png

    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0] = (255, 0, 0)
    rgb[0, 1] = (0, 255, 0)
    rgb[1, 0] = (0, 0, 255)
    rgb[1, 1] = (10, 20, 30)
    got = _decode_png(_encode_png(rgb, 2, [4, 3]))
    # integer BT.601 luma: (299R + 587G + 114B + 500) // 1000
    exp = np.array(
        [
            [(299 * 255 + 500) // 1000, (587 * 255 + 500) // 1000],
            [(114 * 255 + 500) // 1000,
             (299 * 10 + 587 * 20 + 114 * 30 + 500) // 1000],
        ],
        np.uint8,
    )
    assert (got == exp).all()
    assert _decode_png(b"not a png at all") is None
    assert _decode_png(b"") is None


def test_png_features_and_resize_share_raw8_path(spark):
    """A real PNG must ride the SAME histogram/resize kernels as raw8 —
    identical embedding and identical resized bytes for identical pixels —
    and must NOT raise with decode_stub=False (it is a real tier now)."""
    import numpy as np

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(6, 8), dtype=np.uint8)
    schema = (
        "media_id string, kind string, payload binary, "
        "meta struct<width:int, height:int, duration_ms:int, codec:string>"
    )
    media = spark.createDataFrame(
        [
            ("png0", "image", _encode_png(px, 0, [0, 1, 2, 3, 4, 2]),
             {"width": 8, "height": 6, "duration_ms": None, "codec": "png"}),
            ("raw0", "image", px.tobytes(),
             {"width": 8, "height": 6, "duration_ms": None, "codec": "raw8"}),
        ],
        schema,
    )
    feats = {
        r["media_id"]: r["embedding"]
        for r in extract_media_features(media, decode_stub=False).collect()
    }
    assert feats["png0"] == feats["raw0"]
    sizes = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_images(media, 4, 3, decode_stub=False).collect()
    }
    assert sizes["png0"] == sizes["raw0"]
    assert len(sizes["png0"]) == 12


# --- WAV tier (REAL stdlib decode) ----------------------------------------


def _encode_wav(samples_i16, framerate=16000, channels=1):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(np.asarray(samples_i16, "<i2").tobytes())
    return buf.getvalue()


def test_wav_decode_and_histogram_features(spark):
    """A PCM WAV must decode for real (high byte + 128 requantization) and
    ride the SAME histogram kernel as raw8 — identical embedding to a raw8
    payload carrying the requantized samples; no raise at decode_stub=False."""
    import numpy as np

    rng = np.random.RandomState(3)
    samples = rng.randint(-32768, 32767, size=512, dtype=np.int16)
    req = ((samples.astype(np.int32) >> 8) + 128).astype(np.uint8)
    schema = (
        "media_id string, kind string, payload binary, "
        "meta struct<width:int, height:int, duration_ms:int, codec:string>"
    )
    media = spark.createDataFrame(
        [
            ("wav0", "audio", _encode_wav(samples),
             {"width": None, "height": None, "duration_ms": 32, "codec": "wav"}),
            ("raw0", "audio", req.tobytes(),
             {"width": None, "height": None, "duration_ms": 32, "codec": "raw8"}),
            ("bad0", "audio", b"RIFFnot really a wav",
             {"width": None, "height": None, "duration_ms": 32, "codec": "wav"}),
        ],
        schema,
    )
    feats = {
        r["media_id"]: r["embedding"]
        for r in extract_media_features(media).collect()
    }
    assert feats["wav0"] == feats["raw0"]
    # malformed wav falls to the deterministic stub, still unit-norm
    assert abs(sum(x * x for x in feats["bad0"]) - 1.0) < 1e-9
    # decode_stub=False: the REAL wav row must not raise
    ok = extract_media_features(
        media.where("media_id = 'wav0'"), decode_stub=False
    ).collect()
    assert len(ok) == 1
