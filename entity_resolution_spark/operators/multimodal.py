"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a struct
of metadata; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each task streams record batches without ever
collecting to the driver.

The actual codec work (PIL/ffmpeg/torchaudio) is NOT available in this container,
so the decode kernels are STUBBED: ``decode_stub=True`` (default) derives
deterministic fake features from the bytes (sha-seeded), clearly marked; with
``decode_stub=False`` the operators raise ``NotImplementedError`` at the exact
point a real codec plugs in. Everything Spark-side — schema, batching,
partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

_EMBED_DIM = 16


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

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — plug the codec in here"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "payload_sha": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "embedding": payloads.map(
                        lambda b: _stub_embedding(b, dim).tolist()
                    ),
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
    """mapInPandas resize: real implementation decodes + resamples; the stub
    re-hashes the payload with the target dims so output bytes are deterministic
    and dimension-dependent (schema/partitioning identical to the real op)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real resize requires an image codec")
            out = pdf[pdf["kind"] == "image"].copy()
            out["payload"] = out["payload"].map(
                lambda b: hashlib.sha256(
                    (b or b"") + f"{width}x{height}".encode()
                ).digest()
            )
            yield out[["media_id", "kind", "payload"]]

    return media.mapInPandas(op, schema="media_id string, kind string, payload binary")


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (explode on the decode
    axis). The stub derives frame count from meta.duration_ms — the fan-out,
    ordering and schema are exactly what a real ffmpeg-based kernel produces."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows = []
            vids = pdf[pdf["kind"] == "video"]
            for media_id, payload, meta in zip(
                vids["media_id"], vids["payload"], vids["meta"]
            ):
                duration = (meta or {}).get("duration_ms") or 0
                for i, ts in enumerate(range(0, int(duration), every_ms)):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_index": i,
                            "ts_ms": ts,
                            "frame": hashlib.sha256(
                                (payload or b"") + str(ts).encode()
                            ).digest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "ts_ms", "frame"]
            )

    return media.mapInPandas(
        op, schema="media_id string, frame_index int, ts_ms long, frame binary"
    )


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
