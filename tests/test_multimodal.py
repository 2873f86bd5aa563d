"""Multimodal plumbing tests: schema, batch shape, determinism of the stubbed
decode kernels (real Spark path — mapInPandas over binary + struct columns)."""

from __future__ import annotations

import numpy as np
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


# --- JPEG tier (REAL stdlib+numpy baseline decode) ---------------------------


def _jpeg_canonical_codes(bits):
    """Canonical code assignment (T.81 Annex C) as symbol-order list of
    (length, code)."""
    out, code = [], 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code))
            code += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                if self.acc == 0xFF:
                    self.bytes.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1s per T.81 F.1.2.3


def _fdct_ref(block):
    """Independent double-loop forward DCT (T.81 A.3.3) — NOT the decoder's
    matrix path."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


def _idct_ref(coef):
    """Independent double-loop inverse DCT."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


# one flat-length Huffman table pair shared by the test encoder: DC symbols
# 0..11 at length 8, AC symbols (EOB, ZRL, every run/size) at length 9
_DC_BITS = [0] * 16
_DC_BITS[7] = 12
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 16
_AC_BITS[8] = len(_AC_VALS)


def _encode_jpeg(planes, samplings, quants, qmap, w, h, restart=0):
    """Minimal baseline-JPEG ENCODER for the goldens (test-local, encoder-
    only): ``planes`` are full-resolution-per-component 2-D uint8 arrays
    already at their own sampled sizes, ``samplings`` their (hs, vs),
    ``quants`` the zigzag quant tables by id, ``qmap`` per-component table
    id. Returns (payload, quantized-coefficient blocks per component) so a
    test can reconstruct the expected pixels independently."""
    from entity_resolution_spark.operators.multimodal import _JPEG_ZIGZAG

    dc_code = dict(zip(_DC_VALS, _jpeg_canonical_codes(_DC_BITS)))
    ac_code = dict(zip(_AC_VALS, _jpeg_canonical_codes(_AC_BITS)))

    max_h = max(s[0] for s in samplings)
    max_v = max(s[1] for s in samplings)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))

    padded = []
    for p, (hs, vs) in zip(planes, samplings):
        ph, pw = mcus_y * vs * 8, mcus_x * hs * 8
        pp = np.zeros((ph, pw), np.uint8)
        pp[: p.shape[0], : p.shape[1]] = p
        if p.shape[0] < ph:
            pp[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        if p.shape[1] < pw:
            pp[:, p.shape[1]:] = pp[:, p.shape[1] - 1 : p.shape[1]]
        padded.append(pp)

    def emit_block(bw, comp_i, blk, pred):
        q = quants[qmap[comp_i]]
        coef = _fdct_ref(blk.astype(np.float64) - 128.0)
        zz = np.rint(coef.flatten()[_JPEG_ZIGZAG] / q).astype(np.int64)
        diff = int(zz[0]) - pred
        t = int(abs(diff)).bit_length()
        ln, code = dc_code[t]
        bw.put(code, ln)
        if t:
            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_code[0xF0]
                bw.put(code, ln)
                run -= 16
            s = abs(v).bit_length()
            ln, code = ac_code[(run << 4) | s]
            bw.put(code, ln)
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            ln, code = ac_code[0x00]
            bw.put(code, ln)
        return int(zz[0]), zz

    blocks_out = [dict() for _ in planes]
    out = bytearray(b"\xff\xd8")
    for tid, q in quants.items():
        out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + bytes([tid])
        out += bytes(int(x) for x in q)
    ncomp = len(planes)
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for i, (hs, vs) in enumerate(samplings):
        sof += bytes([i + 1, (hs << 4) | vs, qmap[i]])
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    for cls, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        seg = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (2 + len(seg)).to_bytes(2, "big") + seg
    if restart:
        out += b"\xff\xdd\x00\x04" + restart.to_bytes(2, "big")
    sos = bytes([ncomp]) + b"".join(
        bytes([i + 1, 0x00]) for i in range(ncomp)
    ) + b"\x00\x3f\x00"
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    bw = _JpegBitWriter()
    preds = [0] * ncomp
    mcu = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                bw.flush()
                out += bytes(bw.bytes)
                bw = _JpegBitWriter()
                out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
                preds = [0] * ncomp
            for i, (hs, vs) in enumerate(samplings):
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        blk = padded[i][y0 : y0 + 8, x0 : x0 + 8]
                        preds[i], zz = emit_block(bw, i, blk, preds[i])
                        blocks_out[i][(my * vs + by, mx * hs + bx)] = zz
            mcu += 1
    bw.flush()
    out += bytes(bw.bytes) + b"\xff\xd9"
    return bytes(out), blocks_out


def _expected_y(blocks, quants, qmap_y, yw, yh, w, h):
    """Independent reconstruction of the Y plane from the quantized
    coefficient blocks (double-loop IDCT, not the decoder's matrix path)."""
    from entity_resolution_spark.operators.multimodal import _JPEG_ZIGZAG

    plane = np.zeros((yh, yw))
    for (by, bx), zz in blocks.items():
        dq = np.zeros(64)
        dq[_JPEG_ZIGZAG] = zz * quants[qmap_y]
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
            _idct_ref(dq.reshape(8, 8)) + 128.0
        )
    return np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)


def test_jpeg_decode_grayscale_pixel_golden():
    """Random grayscale image, non-multiple-of-8 dims, non-trivial quant
    table: the decoder must reproduce the independently computed
    reconstruction pixel-for-pixel."""
    from entity_resolution_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(7)
    w, h = 13, 11
    px = rng.randint(0, 256, (h, w)).astype(np.uint8)
    q = np.ones(64, np.int64)
    q[1:] = 2  # non-trivial: AC quantized by 2
    payload, blocks = _encode_jpeg([px], [(1, 1)], {0: q}, [0], w, h)
    got = _decode_jpeg(payload)
    yw = yh = 16
    want = _expected_y(blocks[0], {0: q}, 0, yw, yh, w, h)
    assert got is not None and got.shape == (h, w)
    np.testing.assert_array_equal(got, want)


def test_jpeg_constant_blocks_roundtrip_and_raw8_parity(spark):
    """8x8-constant blocks survive the DCT round trip EXACTLY (DC-only,
    quant 1), so a jpeg payload and the raw8 payload of the same pixels must
    produce IDENTICAL features and resize output through the full Spark
    operators — the jpeg≡raw8 parity the PNG/WAV tiers already have."""
    from entity_resolution_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _decode_jpeg,
        extract_media_features,
        resize_images,
    )

    rng = np.random.RandomState(23)
    w, h = 16, 8
    small = rng.randint(0, 256, (h // 8, w // 8)).astype(np.uint8)
    px = np.kron(small, np.ones((8, 8), np.uint8))
    q = np.ones(64, np.int64)
    payload, _ = _encode_jpeg([px], [(1, 1)], {0: q}, [0], w, h)
    got = _decode_jpeg(payload)
    np.testing.assert_array_equal(got, px)

    media = spark.createDataFrame(
        [
            ("jpeg0", "image", bytearray(payload),
             {"width": w, "height": h, "duration_ms": None, "codec": "jpeg"}),
            ("raw0", "image", bytearray(px.tobytes()),
             {"width": w, "height": h, "duration_ms": None, "codec": "raw8"}),
        ],
        MEDIA_SCHEMA,
    )
    feats = {
        r["media_id"]: r["embedding"]
        for r in extract_media_features(media).collect()
    }
    assert feats["jpeg0"] == feats["raw0"]
    sizes = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_images(media, 4, 3).collect()
    }
    assert sizes["jpeg0"] == sizes["raw0"]
    assert len(sizes["jpeg0"]) == 12


def test_jpeg_ycbcr_subsampled_restart_golden():
    """3-component 4:2:0 with a restart interval of 1: chroma blocks must be
    entropy-consumed (wrong offsets corrupt every later Y block), restart
    markers must reset DC predictors, and the Y plane must match the
    independent reconstruction."""
    from entity_resolution_spark.operators.multimodal import _decode_jpeg

    rng = np.random.RandomState(41)
    w, h = 18, 10  # 2 MCUs x 1 MCU at 16x16
    y = rng.randint(0, 256, (h, w)).astype(np.uint8)
    cb = rng.randint(0, 256, (-(-h // 2), -(-w // 2))).astype(np.uint8)
    cr = rng.randint(0, 256, (-(-h // 2), -(-w // 2))).astype(np.uint8)
    qy = np.ones(64, np.int64)
    qc = np.full(64, 4, np.int64)
    qc[0] = 1
    payload, blocks = _encode_jpeg(
        [y, cb, cr], [(2, 2), (1, 1), (1, 1)], {0: qy, 1: qc}, [0, 1, 1],
        w, h, restart=1,
    )
    got = _decode_jpeg(payload)
    want = _expected_y(blocks[0], {0: qy}, 0, 32, 16, w, h)
    assert got is not None and got.shape == (h, w)
    np.testing.assert_array_equal(got, want)


def test_jpeg_malformed_and_progressive_fall_through():
    from entity_resolution_spark.operators.multimodal import _decode_jpeg

    assert _decode_jpeg(b"") is None
    assert _decode_jpeg(b"not a jpeg") is None
    assert _decode_jpeg(b"\xff\xd8\xff\xd9") is None
    # progressive frame marker (SOF2) must fall through, not decode garbage
    prog = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00\xff\xd9"
    assert _decode_jpeg(prog) is None
