"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract is real and tested — schema, Arrow batch
shape, partition-preserving mapInPandas, typed metadata — while the
actual codecs are stubbed (this container ships no image/audio
libraries). ``decode_*`` raise NotImplementedError; a clearly-marked
DETERMINISTIC FAKE featurizer exercises the full plumbing so the
pipeline around the stub is verifiable end-to-end.

At scale: media payloads dominate row size, so the ops below
column-prune to (id, payload) before the Python exchange, and the
pipeline should store media in its own table keyed by content hash
(dedup before decode — decode is the expensive stage).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta map<string,string>"
)

FEATURE_DIM = 8
FEATURE_SCHEMA = f"media_id long, feature array<float>, n_bytes int"


def decode_image(payload: bytes):
    """STUB: real implementation needs an image codec (PIL/cv2 —
    absent in this container). The Spark plumbing around it is real."""
    raise NotImplementedError("image decode requires an image codec library")


def decode_audio(payload: bytes):
    """STUB: see decode_image."""
    raise NotImplementedError("audio decode requires an audio codec library")


def sample_frames(payload: bytes, every_n: int = 30):
    """STUB: video frame sampling requires a video codec."""
    raise NotImplementedError("video decode requires a video codec library")


def _fake_feature(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE feature vector (md5-seeded), standing in for
    a real encoder so batch shape / schema / partitioning are testable.
    Replace with a real model call; the Spark contract is unchanged."""
    h = hashlib.md5(payload or b"").digest()
    return (np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 255.0)


def featurize_media(media: DataFrame, use_fake: bool = True) -> DataFrame:
    """media(media_id, payload, ...) → (media_id, feature, n_bytes).

    Arrow-batched mapInPandas; column-prunes to (media_id, payload)
    so the exchange never ships metadata columns alongside payloads.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            feats, nbytes = [], []
            for p in b["payload"]:
                raw = bytes(p) if p is not None else b""
                if use_fake:
                    feats.append(_fake_feature(raw).tolist())
                else:
                    feats.append(decode_image(raw))  # raises: stub
                nbytes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].values,
                    "feature": feats,
                    "n_bytes": nbytes,
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, FEATURE_SCHEMA)


RESIZED_SCHEMA = "media_id long, resized binary, out_w int, out_h int"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def resize_images(media: DataFrame, out_w: int = 64, out_h: int = 64,
                  use_fake: bool = True) -> DataFrame:
    """media → (media_id, resized, out_w, out_h). Real resize needs an
    image codec (stubbed); the DETERMINISTIC FAKE derives out_w*out_h
    bytes from the payload via md5 expansion, so byte counts / schema /
    batch shape behave like the real op."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = out_w * out_h
        for b in batches:
            if not len(b):
                continue
            out = []
            for p in b["payload"]:
                raw = bytes(p) if p is not None else b""
                if not use_fake:
                    decode_image(raw)  # raises: stub
                buf = bytearray()
                seed = hashlib.md5(raw).digest()
                while len(buf) < target:
                    seed = hashlib.md5(seed).digest()
                    buf.extend(seed)
                out.append(bytes(buf[:target]))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].values,
                    "resized": out,
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, RESIZED_SCHEMA)


def sample_video_frames(media: DataFrame, n_frames: int = 4,
                        use_fake: bool = True) -> DataFrame:
    """media → one row PER SAMPLED FRAME (media_id, frame_idx, frame):
    the row-exploding output shape of a real frame sampler. Fake frames
    are deterministic payload slices; the real path raises (stub)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            ids, idxs, frames = [], [], []
            for mid, p in zip(b["media_id"], b["payload"]):
                raw = bytes(p) if p is not None else b""
                if not use_fake:
                    sample_frames(raw)  # raises: stub
                step = max(1, len(raw) // max(n_frames, 1))
                for k in range(n_frames):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(raw[k * step:(k + 1) * step] or b"\x00")
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.select("media_id", "payload").mapInPandas(gen, FRAMES_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload = UTF-8 bytes
    of the repeated md5 hex digest keyed by media_id. (ASCII content —
    rather than raw digest bytes — keeps the payload expressible as a
    DuckDB VARCHAR so the driver oracle can recompute the md5-derived
    features independently; the column TYPE stays binary, which is the
    part the plumbing contract cares about.)"""
    rows = []
    for i in range(n):
        seed = hashlib.md5(f"media:{i}".encode()).hexdigest()
        rows.append(
            (
                i,
                ["image", "audio", "video"][i % 3],
                (seed * (1 + i % 4)).encode("ascii"),
                {"w": str(64 + i), "h": str(48 + i)},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
