"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract — schema, Arrow batch shape, partition-
preserving mapInPandas, typed metadata — is real and tested, and so
are the codecs for the library-free formats: PPM images (P6 binary /
P3 ASCII, the netpbm format every tool can emit), RIFF/WAVE PCM audio
(8/16-bit, any channel count), and PPM-stream video (concatenated P6
frames — exactly what ``ffmpeg -f image2pipe -vcodec ppm`` pipes out).
Compressed formats (JPEG/PNG/MP3/H.264) would need codec libraries
this container doesn't ship; ``decode_*`` raise ValueError on them
with a clear message. A clearly-marked DETERMINISTIC FAKE featurizer
remains the default so driver oracles stay closed-form.

At scale: media payloads dominate row size, so the ops below
column-prune to the columns they read before the Python exchange, and
the pipeline should store media in its own table keyed by content hash
(dedup before decode — decode is the expensive stage).
"""

from __future__ import annotations

import hashlib
import struct
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


# -- codecs (pure Python/NumPy — no external libraries) ----------------------

def _ppm_header_tokens(buf: bytes, start: int, need: int):
    """Read ``need`` whitespace-separated ASCII tokens from a netpbm
    header, honoring '#' comments; returns (tokens, index-after-last)."""
    toks: list[bytes] = []
    i = start
    n = len(buf)
    while len(toks) < need:
        while i < n and buf[i : i + 1].isspace():
            i += 1
        if i < n and buf[i : i + 1] == b"#":
            while i < n and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(buf[i:j])
        i = j
    return toks, i


def _decode_one_ppm(payload: bytes, start: int = 0):
    """Decode one PPM image at ``start``; returns (array h×w×3 uint8,
    index-after-raster). Raises ValueError on anything that is not
    P6/P3."""
    magic = payload[start : start + 2]
    if magic not in (b"P6", b"P3"):
        raise ValueError(
            "unsupported image format (PPM P6/P3 supported; compressed "
            "formats need a codec library this container does not ship)"
        )
    (w_b, h_b, mx_b), pos = _ppm_header_tokens(payload, start + 2, 3)
    w, h, maxval = int(w_b), int(h_b), int(mx_b)
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError("invalid PPM dimensions/maxval")
    if magic == b"P6":
        pos += 1  # exactly ONE whitespace byte separates header & raster
        n_samples = w * h * 3
        if maxval < 256:
            end = pos + n_samples
            raw = np.frombuffer(payload[pos:end], dtype=np.uint8)
        else:
            end = pos + 2 * n_samples
            raw = np.frombuffer(payload[pos:end], dtype=">u2")
        if len(raw) != n_samples:
            raise ValueError("truncated PPM raster")
    else:  # P3: ASCII samples
        toks, end = _ppm_header_tokens(payload, pos, w * h * 3)
        raw = np.array([int(t) for t in toks], dtype=np.uint32)
        if (raw > maxval).any():
            raise ValueError("P3 sample exceeds maxval")
    if maxval != 255:
        raw = (raw.astype(np.uint32) * 255 // maxval)
    return raw.astype(np.uint8).reshape(h, w, 3), end


def decode_image(payload: bytes):
    """Decode a PPM (P6 binary or P3 ASCII) image.

    Returns an (h, w, 3) uint8 NumPy array, samples rescaled to the
    0-255 range when maxval differs. ValueError on non-PPM payloads.
    """
    arr, _ = _decode_one_ppm(bytes(payload), 0)
    return arr


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 array → binary P6 bytes (decode_image inverse)."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("expected an (h, w, 3) array")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_audio(payload: bytes):
    """Decode RIFF/WAVE PCM audio (8-bit unsigned or 16-bit signed).

    Returns (sample_rate, samples) with samples an (n, channels) int16
    array (8-bit input is centered and widened). ValueError on
    anything that is not canonical PCM WAV.
    """
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            "unsupported audio format (PCM RIFF/WAVE supported; "
            "compressed formats need a codec library)"
        )
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        # truncated payload or a pre-PCM 14-byte WAVEFORMAT header:
        # unpack_from would raise struct.error, breaking the documented
        # ValueError contract that lets pipelines skip bad media
        raise ValueError(f"fmt chunk too short: {len(fmt)} bytes")
    audio_format, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1:
        raise ValueError("only uncompressed PCM WAV is supported")
    if channels < 1:
        raise ValueError("invalid channel count")
    if bits == 16:
        arr = np.frombuffer(data[: len(data) - len(data) % (2 * channels)],
                            dtype="<i2")
    elif bits == 8:
        raw = np.frombuffer(data[: len(data) - len(data) % channels],
                            dtype=np.uint8)
        arr = (raw.astype(np.int16) - 128) << 8
    else:
        raise ValueError(f"unsupported PCM bit depth: {bits}")
    return rate, arr.reshape(-1, channels)


def encode_wav(samples, rate: int) -> bytes:
    """(n, channels) int16 array → 16-bit PCM WAV (decode_audio inverse)."""
    a = np.ascontiguousarray(np.asarray(samples, dtype="<i2"))
    if a.ndim == 1:
        a = a[:, None]
    channels = a.shape[1]
    data = a.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def sample_frames(payload: bytes, every_n: int = 30):
    """Sample every ``every_n``-th frame from a PPM stream (consecutive
    P6 images — ffmpeg's ``-f image2pipe -vcodec ppm`` output).

    Returns a list of (frame_idx, (h, w, 3) uint8 array).
    """
    payload = bytes(payload)
    frames = []
    pos = 0
    idx = 0
    if payload[:2] not in (b"P6", b"P3"):
        raise ValueError(
            "unsupported video format (PPM stream supported; compressed "
            "containers need a codec library)"
        )
    while pos < len(payload):
        arr, pos = _decode_one_ppm(payload, pos)
        if idx % max(every_n, 1) == 0:
            frames.append((idx, arr))
        idx += 1
        # tolerate inter-frame whitespace some writers emit
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
    return frames


def _fake_feature(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE feature vector (md5-seeded), standing in for
    a real encoder so batch shape / schema / partitioning are testable.
    Replace with a real model call; the Spark contract is unchanged."""
    h = hashlib.md5(payload or b"").digest()
    return (np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 255.0)


def _hist_feature(values: np.ndarray, lo: float, hi: float) -> list:
    """FEATURE_DIM-bin normalized histogram as float32 fractions."""
    hist, _ = np.histogram(values, bins=FEATURE_DIM, range=(lo, hi))
    total = hist.sum()
    if total == 0:
        return [0.0] * FEATURE_DIM
    return (hist.astype(np.float32) / np.float32(total)).tolist()


def _real_feature(raw: bytes, kind: str) -> list:
    """Decode by kind and featurize: luminance histogram for images /
    video first-frame, amplitude histogram for audio."""
    if kind == "audio":
        _, samples = decode_audio(raw)
        return _hist_feature(
            samples.astype(np.float32), -32768.0, 32768.0
        )
    if kind == "video":
        frames = sample_frames(raw, every_n=1)
        arr = frames[0][1]
    else:
        arr = decode_image(raw)
    lum = arr.astype(np.float32).mean(axis=2)
    return _hist_feature(lum, 0.0, 256.0)


def featurize_media(media: DataFrame, use_fake: bool = True) -> DataFrame:
    """media(media_id, payload, ...) → (media_id, feature, n_bytes).

    Arrow-batched mapInPandas; column-prunes to the columns it reads
    (payload + media_id, plus kind on the real path) so the exchange
    never ships metadata columns alongside payloads.

    ``use_fake=True`` (default) keeps the md5-seeded DETERMINISTIC FAKE
    the driver oracle mirrors in closed form; ``use_fake=False`` runs
    the real codecs (PPM / PCM WAV / PPM-stream) and emits an
    FEATURE_DIM-bin luminance/amplitude histogram.
    """
    cols = ["media_id", "payload"] + ([] if use_fake else ["kind"])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            feats, nbytes = [], []
            kinds = b["kind"] if not use_fake else [None] * len(b)
            for p, kind in zip(b["payload"], kinds):
                raw = bytes(p) if p is not None else b""
                if use_fake:
                    feats.append(_fake_feature(raw).tolist())
                else:
                    feats.append(_real_feature(raw, kind))
                nbytes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].values,
                    "feature": feats,
                    "n_bytes": nbytes,
                }
            )

    return media.select(*cols).mapInPandas(gen, FEATURE_SCHEMA)


RESIZED_SCHEMA = "media_id long, resized binary, out_w int, out_h int"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def resize_images(media: DataFrame, out_w: int = 64, out_h: int = 64,
                  use_fake: bool = True) -> DataFrame:
    """media → (media_id, resized, out_w, out_h).

    Real path (``use_fake=False``): decode PPM → nearest-neighbor
    resample on real pixels → re-encode P6 (the output is itself a
    decodable image). The DETERMINISTIC FAKE (default) derives
    out_w*out_h bytes from the payload via md5 expansion, so byte
    counts / schema / batch shape behave like the real op while
    staying closed-form for oracles."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = out_w * out_h
        for b in batches:
            if not len(b):
                continue
            out = []
            for p in b["payload"]:
                raw = bytes(p) if p is not None else b""
                if not use_fake:
                    arr = decode_image(raw)
                    h, w = arr.shape[:2]
                    yi = (np.arange(out_h) * h) // out_h
                    xi = (np.arange(out_w) * w) // out_w
                    out.append(encode_ppm(arr[yi][:, xi]))
                    continue
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
                        use_fake: bool = True, every_n: int = 1) -> DataFrame:
    """media → one row PER SAMPLED FRAME (media_id, frame_idx, frame):
    the row-exploding output shape of a frame sampler.

    Real path (``use_fake=False``): decode the PPM stream, keep every
    ``every_n``-th frame, emit each re-encoded as P6 with its stream
    index. Fake frames (default) are deterministic payload slices."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            ids, idxs, frames = [], [], []
            for mid, p in zip(b["media_id"], b["payload"]):
                raw = bytes(p) if p is not None else b""
                if not use_fake:
                    for idx, arr in sample_frames(raw, every_n=every_n):
                        ids.append(mid)
                        idxs.append(idx)
                        frames.append(encode_ppm(arr))
                    continue
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
