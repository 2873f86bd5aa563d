"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a struct
of metadata; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each task streams record batches without ever
collecting to the driver.

Codec policy (tiers decided per row by ``meta.codec``):

1. ``raw8`` — REAL math, no external codec needed: the payload is raw 8-bit
   grayscale pixels (images: ``width·height`` bytes; video: concatenated
   frames of ``width·height`` bytes each). Decode, histogram features,
   nearest-neighbor resize and frame slicing are genuine numpy kernels with
   golden tests — the full operator path runs end-to-end on raw media.
2. ``png`` — REAL decode with the stdlib only (:func:`_decode_png`: chunk
   walk + ``zlib`` inflate + numpy unfiltering of all five PNG filter
   types, 8-bit gray/RGB/RGBA/gray-alpha, RGB reduced by integer BT.601
   luma). A payload that is not a well-formed supported PNG falls through
   to tier 3/4 like any other compressed codec.
   ``jpeg`` — REAL decode with stdlib+numpy only (:func:`_decode_jpeg`:
   baseline sequential T.81 — marker walk, Huffman entropy decode,
   dequantize, matrix IDCT — any sampling factors, restart intervals; the
   luma plane is the output, which is the same BT.601 domain the PNG tier
   reduces RGB to). Progressive/arithmetic fall through to tier 3/4.
   ``wav`` — REAL decode via the stdlib ``wave`` module
   (:func:`_decode_wav`: RIFF/WAVE PCM, 8/16/32-bit widths mapped to the
   8-bit sample domain), feeding the same histogram-feature kernel.
3. the remaining compressed codecs (h264/opus) with ``decode_stub=True``
   (default) — deterministic sha-seeded fakes, clearly marked: PIL/ffmpeg
   are NOT in this container, so the fake keeps schema/batching/fan-out
   identical to a real decode while being stable across runs and partitions.
4. ``decode_stub=False`` — raise ``NotImplementedError`` at the exact point a
   real codec plugs in.

Everything Spark-side — schema, batching, partitioning, UDF signatures — is
identical across the three tiers.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

_EMBED_DIM = 16


def _raw8_pixels(payload: bytes, meta) -> np.ndarray | None:
    """raw8 payload + meta(width, height) → (h, w) uint8 array, or None when
    the meta/payload contract is broken (caller falls back to the stub)."""
    m = meta or {}
    w, h = m.get("width") or 0, m.get("height") or 0
    if w <= 0 or h <= 0 or payload is None or len(payload) < w * h:
        return None
    return np.frombuffer(payload, dtype=np.uint8, count=w * h).reshape(h, w)


def _histogram_embedding(values: np.ndarray, dim: int = _EMBED_DIM) -> np.ndarray:
    """REAL feature vector for raw media: unit-norm ``dim``-bin intensity
    histogram of the decoded 8-bit samples."""
    hist = np.bincount(values.ravel() >> max(0, 8 - dim.bit_length() + 1), minlength=dim)[:dim]
    v = hist.astype(np.float64)
    n = np.linalg.norm(v)
    return v / n if n else v


def _nn_index(dst_n: int, src_n: int) -> np.ndarray:
    """Nearest-neighbor sample positions: src_i = floor((dst_i + 0.5)·src/dst),
    in exact integer arithmetic."""
    d = np.arange(dst_n, dtype=np.int64)
    return (2 * d + 1) * src_n // (2 * dst_n)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _decode_png(payload: bytes) -> np.ndarray | None:
    """Minimal REAL PNG decoder with the stdlib only (no PIL): chunk walk →
    ``zlib.decompress`` of the IDAT stream → per-scanline unfiltering of all
    five PNG filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6) → (h, w)
    uint8 grayscale. Supports bit depth 8, color types 0/2/4/6,
    non-interlaced — the overwhelmingly common layout; RGB(A) reduces by the
    integer BT.601 luma ``(299R + 587G + 114B + 500) // 1000``; alpha is
    ignored. Returns None for anything not a well-formed supported PNG, so
    callers fall through to the stub/plug-point tier exactly as before.

    Row filters Sub/Average/Paeth are sequential along the scanline by
    definition (each byte depends on the reconstructed byte one pixel left),
    so those rows run a per-byte loop; Up rows vectorize (uint8 wraparound
    addition IS the spec's mod-256 arithmetic). A production deploy would
    swap in an optimized codec here — the point of this tier is that the
    math, goldens, and downstream histogram/resize path are real.
    """
    if not payload or payload[: len(_PNG_SIG)] != _PNG_SIG:
        return None
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = None
    bitd = ct = interlace = -1
    try:
        while pos + 8 <= len(payload):
            ln = int.from_bytes(payload[pos : pos + 4], "big")
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            if len(data) < ln:
                return None
            pos += 12 + ln  # length + type + data + CRC
            if typ == b"IHDR":
                if ln < 13:
                    return None
                w = int.from_bytes(data[0:4], "big")
                h = int.from_bytes(data[4:8], "big")
                bitd, ct, interlace = data[8], data[9], data[12]
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
        ch = _PNG_CHANNELS.get(ct)
        if not w or not h or bitd != 8 or interlace != 0 or ch is None:
            return None
        raw = zlib.decompress(bytes(idat))
    except Exception:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    rp = 0
    for y in range(h):
        f = raw[rp]
        line = np.frombuffer(raw, np.uint8, stride, rp + 1).copy()
        rp += stride + 1
        if f == 0:  # None
            rec = line
        elif f == 2:  # Up — vectorized; uint8 wraparound == mod 256
            rec = line + prev
        elif f == 1:  # Sub (int arithmetic masked to the spec's mod 256 —
            # uint8 scalar wraparound is correct too but numpy warns on it)
            rec = line
            for x in range(ch, stride):
                rec[x] = (int(rec[x]) + int(rec[x - ch])) & 0xFF
        elif f == 3:  # Average
            rec = line
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            return None
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, ch)
    if ch in (1, 2):  # gray / gray+alpha: channel 0 is the luma
        return px[:, :, 0].copy()
    rgb = px[:, :, :3].astype(np.uint32)
    return (
        (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2] + 500)
        // 1000
    ).astype(np.uint8)


# --- Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) -----------------------
# Zigzag order: _JPEG_ZIGZAG[i] = flat (row*8+col) position of the i-th
# coefficient in scan order (T.81 Figure A.6).
_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II basis: block = T.T @ coeff @ T is the 2-D
# type-III inverse (T.81 A.3.3 up to the orthonormal scaling convention).
_JPEG_IDCT_T = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _jpeg_huff(bits, vals):
    """(BITS counts per length 1..16, HUFFVAL) → {(length, code): symbol}
    per T.81 Annex C code assignment."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over one entropy-coded segment (already
    byte-unstuffed)."""

    def __init__(self, data: bytes):
        self.d, self.pos, self.bit = data, 0, 0

    def read_bit(self) -> int:
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): map a t-bit magnitude to its signed
    value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Minimal REAL baseline-JPEG decoder with stdlib+numpy only (no PIL):
    marker walk (DQT/SOF0/DHT/SOS/DRI) → per-MCU Huffman decode of every
    component (DC diff + AC run-length in zigzag order, T.81 F.2) →
    dequantize → orthonormal matrix IDCT → the LUMA (Y) plane as (h, w)
    uint8. Chroma blocks are entropy-decoded (the bitstream demands it) but
    not reconstructed: the pipeline's downstream kernels are grayscale, and
    JFIF Y already IS the BT.601 luma the PNG tier reduces RGB to — the two
    image tiers land in the same sample domain by construction.

    Supported: 8-bit sequential baseline (SOF0), any sampling factors,
    restart intervals. Progressive (SOF2), arithmetic coding, and 12-bit
    precision return None, falling through to the stub/plug-point tier like
    any other unsupported codec. At 100 TB the per-row work is unchanged in
    shape — swap an optimized codec in here; the tier's point is that the
    real decode's schema/batching/fan-out is exercised end-to-end."""
    if not payload or payload[:2] != b"\xff\xd8":
        return None
    try:
        return _decode_jpeg_inner(payload)
    except Exception:
        return None


def _decode_jpeg_inner(payload: bytes) -> np.ndarray | None:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps: list[dict] = []
    w = h = 0
    restart = 0
    scan_order: list[dict] = []
    scan_start = -1
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            return None
        ln = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        seg = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt[tid] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            n = seg[5]
            comps = [
                {
                    "id": seg[6 + 3 * c],
                    "hs": seg[7 + 3 * c] >> 4,
                    "vs": seg[7 + 3 * c] & 0xF,
                    "q": seg[8 + 3 * c],
                }
                for c in range(n)
            ]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                huff[(cls, tid)] = _jpeg_huff(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                cid, tids = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cid)
                comp["dc"], comp["ac"] = tids >> 4, tids & 0xF
                scan_order.append(comp)
            scan_start = pos
            break
    if scan_start < 0 or not comps or not w or not h:
        return None

    # split the entropy stream into restart segments, unstuffing FF00
    segments: list[bytes] = []
    cur = bytearray()
    i = scan_start
    end = len(payload)
    while i < end:
        b = payload[i]
        if b == 0xFF and i + 1 < end:
            m = payload[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            if m == 0xD9:  # EOI
                break
            i += 2
            continue
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    max_h = max(c["hs"] for c in comps)
    max_v = max(c["vs"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    y_comp = comps[0]
    yw, yh = mcus_x * 8 * y_comp["hs"], mcus_y * 8 * y_comp["vs"]
    yplane = np.zeros((yh, yw), np.float64)

    seg_idx = 0
    bits = _JpegBits(segments[0])
    pred = {c["id"]: 0 for c in comps}
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                seg_idx += 1
                bits = _JpegBits(segments[seg_idx])
                pred = {c["id"]: 0 for c in comps}
            for comp in scan_order:
                dcT = huff[(0, comp["dc"])]
                acT = huff[(1, comp["ac"])]
                q = qt[comp["q"]]
                for by in range(comp["vs"]):
                    for bx in range(comp["hs"]):
                        coef = np.zeros(64, np.int64)
                        t = bits.decode_symbol(dcT)
                        diff = _jpeg_extend(bits.read_bits(t), t)
                        pred[comp["id"]] += diff
                        coef[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = bits.decode_symbol(acT)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            coef[k] = _jpeg_extend(bits.read_bits(s), s)
                            k += 1
                        if comp is not y_comp:
                            continue  # chroma: bitstream consumed, not built
                        dq = np.zeros(64, np.float64)
                        dq[_JPEG_ZIGZAG] = coef * q
                        block = (
                            _JPEG_IDCT_T.T @ dq.reshape(8, 8) @ _JPEG_IDCT_T
                        ) + 128.0
                        y0 = (my * comp["vs"] + by) * 8
                        x0 = (mx * comp["hs"] + bx) * 8
                        yplane[y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1
    return np.clip(np.rint(yplane[:h, :w]), 0, 255).astype(np.uint8)


def _decode_wav(payload: bytes) -> np.ndarray | None:
    """REAL PCM WAV decode with the stdlib ``wave`` module: returns the raw
    samples mapped to uint8 (8-bit unsigned PCM as-is; 16/32-bit signed PCM
    by high byte + 128 — the standard 8-bit requantization), channels
    interleaved. None for anything ``wave`` can't parse (compressed WAVs,
    truncated payloads), so callers fall through to the stub tier."""
    import io
    import wave

    if not payload:
        return None
    try:
        with wave.open(io.BytesIO(payload)) as w:
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except Exception:
        return None
    if width == 1:
        return np.frombuffer(frames, np.uint8).copy()
    if width == 2:
        s = np.frombuffer(frames, "<i2")
        return ((s.astype(np.int32) >> 8) + 128).astype(np.uint8)
    if width == 4:
        s = np.frombuffer(frames, "<i4")
        return ((s >> 24) + 128).astype(np.uint8)
    return None


def _stub_embedding(payload: bytes, dim: int = _EMBED_DIM) -> np.ndarray:
    """Deterministic fake feature vector: bytes → sha256 → unit-norm float vector.
    Stands in for a real image/audio encoder; stable across runs and partitions."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
    n = np.linalg.norm(v)
    return v / n if n else v


def extract_media_features(
    media: DataFrame, decode_stub: bool = True, dim: int = _EMBED_DIM
) -> DataFrame:
    """mapInPandas: (media_id, kind, payload, meta) → (media_id, kind, n_bytes,
    payload_sha, embedding array<double>).

    Batch shape: each Arrow batch is decoded as a unit (the real operator would
    hold one decoded image/clip at a time — peak memory is one batch, not one
    partition).
    """

    def one_embedding(payload, meta) -> list[float]:
        codec = (meta or {}).get("codec")
        if codec == "raw8":
            # REAL decode: intensity histogram over every raw 8-bit sample
            # (image pixels / all video frames / audio PCM alike)
            arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
            return _histogram_embedding(arr, dim).tolist()
        if codec == "png":
            # REAL stdlib decode; malformed payloads fall through
            px = _decode_png(payload)
            if px is not None:
                return _histogram_embedding(px, dim).tolist()
        if codec == "jpeg":
            # REAL stdlib+numpy baseline decode (luma plane)
            px = _decode_jpeg(payload)
            if px is not None:
                return _histogram_embedding(px, dim).tolist()
        if codec == "wav":
            samples = _decode_wav(payload)
            if samples is not None and len(samples):
                return _histogram_embedding(samples, dim).tolist()
        if not decode_stub:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg — plug the codec in here"
            )
        return _stub_embedding(payload, dim).tolist()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "payload_sha": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "embedding": [
                        one_embedding(b, m)
                        for b, m in zip(payloads, pdf["meta"])
                    ],
                }
            )

    return media.mapInPandas(
        op,
        schema=(
            "media_id string, kind string, n_bytes long, payload_sha string, "
            "embedding array<double>"
        ),
    )


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """mapInPandas resize. ``raw8`` images get a REAL nearest-neighbor
    resample (golden-tested pixel selection); compressed codecs fall to the
    sha stub (deterministic, dimension-dependent bytes) or, with
    ``decode_stub=False``, to the codec plug point."""

    def one_resize(payload, meta):
        codec = (meta or {}).get("codec")
        px = None
        if codec == "raw8":
            px = _raw8_pixels(payload, meta)
        elif codec == "png":
            px = _decode_png(payload)  # REAL stdlib decode (grayscale out)
        elif codec == "jpeg":
            px = _decode_jpeg(payload)  # REAL baseline decode (luma out)
        if px is not None:
            ri = _nn_index(height, px.shape[0])
            ci = _nn_index(width, px.shape[1])
            return px[np.ix_(ri, ci)].tobytes()
        if not decode_stub:
            raise NotImplementedError("real resize requires an image codec")
        return hashlib.sha256((payload or b"") + f"{width}x{height}".encode()).digest()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["kind"] == "image"].copy()
            out["payload"] = [
                one_resize(b, m) for b, m in zip(out["payload"], out["meta"])
            ]
            yield out[["media_id", "kind", "payload"]]

    return media.mapInPandas(op, schema="media_id string, kind string, payload binary")


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (explode on the decode
    axis). ``raw8`` video (payload = concatenated width·height-byte frames)
    gets REAL slicing: ts maps to the stored frame at
    ``min(n_frames−1, ts·n_frames // duration_ms)`` and the emitted bytes ARE
    that frame. Compressed codecs fall to the sha stub (same fan-out,
    ordering and schema) or the ffmpeg plug point."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            vids = pdf[pdf["kind"] == "video"]
            for media_id, payload, meta in zip(
                vids["media_id"], vids["payload"], vids["meta"]
            ):
                m = meta or {}
                duration = int(m.get("duration_ms") or 0)
                fsize = (m.get("width") or 0) * (m.get("height") or 0)
                raw8 = (
                    m.get("codec") == "raw8"
                    and fsize > 0
                    and payload is not None
                    and len(payload) >= fsize
                )
                if not raw8 and not decode_stub:
                    raise NotImplementedError("real frame sampling requires ffmpeg")
                n_frames = len(payload) // fsize if raw8 else 0
                for i, ts in enumerate(range(0, duration, every_ms)):
                    if raw8:
                        fi = min(n_frames - 1, ts * n_frames // duration)
                        frame = payload[fi * fsize : (fi + 1) * fsize]
                    else:
                        frame = hashlib.sha256(
                            (payload or b"") + str(ts).encode()
                        ).digest()
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_index": i,
                            "ts_ms": ts,
                            "frame": frame,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "ts_ms", "frame"]
            )

    return media.mapInPandas(
        op, schema="media_id string, frame_index int, ts_ms long, frame binary"
    )


def synth_raw8_media(spark, n: int = 30, seed: int = 7) -> DataFrame:
    """Deterministic raw8 media table: images carry width·height pixel bytes,
    videos carry one width·height frame per second of duration — the REAL
    decode tier runs end-to-end on this."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "video"][i % 2]
        w, h = 8, 6
        if kind == "image":
            payload = bytes(rng.getrandbits(8) for _ in range(w * h))
            meta = {"width": w, "height": h, "duration_ms": None, "codec": "raw8"}
        else:
            secs = 3 + (i % 3)
            payload = bytes(rng.getrandbits(8) for _ in range(w * h * secs))
            meta = {
                "width": w, "height": h,
                "duration_ms": secs * 1000, "codec": "raw8",
            }
        rows.append((f"r{i:04d}", kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (seeded bytes, mixed kinds)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(64 + (i % 5) * 32))
        meta = {
            "width": 640 if kind == "image" else None,
            "height": 480 if kind == "image" else None,
            "duration_ms": 3000 + (i % 4) * 1000 if kind != "image" else None,
            "codec": {"image": "png", "audio": "opus", "video": "h264"}[kind],
        }
        rows.append((f"m{i:04d}", kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
