"""Audio feature extraction — the loudness/activity signals an audio
dataset curator filters on (silence detection, clipping audits,
speech-vs-tone heuristics) over the repo's real PCM WAV codec:

- ``energy_sq``: sum of squares over ALL raw channel samples (exact
  BIGINT — 16-bit squares cannot overflow it at any real length);
- ``zero_crossings``: sign changes of the MONO stream (channel sum in
  int64; >= 0 counts as non-negative) — the classic ZCR numerator;
- ``clip_milli``: permille of raw samples at the source format's
  full-scale rails — for 16-bit PCM that is -32768 / 32767; for
  8-bit PCM the codec widens (raw - 128) << 8, so the rails are
  -32768 (raw 0x00) and 32512 (raw 0xFF): testing only 32767 would
  make the audit blind to positively-clipped 8-bit audio;
- ``rms_milli``: ``isqrt(1e6 * mono_energy_sq div n)`` — RMS of the
  mono stream in exact milli units (``math.isqrt``, never float
  sqrt, so the value is deterministic at any magnitude);
- undecodable payloads keep their row with NULL features (the
  multimodal skip-bad-media contract).

An out-of-phase stereo pair has ``energy_sq`` > 0 but mono RMS 0 —
raw energy and mono loudness are deliberately distinct signals (the
audiofp magnitude-sum mono rule is about fingerprints; loudness
cancellation is real and reported as heard).

Scale shape: one shuffle-free mapInPandas pass, NumPy-vectorized per
payload, Arrow-batched.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from hickoryspark.ops.multimodal import decode_audio

__all__ = ["audio_feature_row", "audio_features"]


def _wav_bits(payload: bytes) -> int:
    """Bit depth from the fmt chunk (the decoded array no longer
    carries it, and the clip rails differ per depth). Mirrors
    decode_audio's RIFF walk EXACTLY — keeps the LAST fmt chunk and
    applies the same len>=16 check — so a crafted dual-fmt or
    short-first-fmt payload can neither desync the clip rail from the
    decoded samples nor raise struct.error past the caller's
    ValueError contract."""
    import struct

    fmt = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if cid == b"fmt ":
            fmt = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or len(fmt) < 16:
        raise ValueError("WAV missing/short fmt chunk")
    return struct.unpack_from("<H", fmt, 14)[0]


def audio_feature_row(payload: Optional[bytes]):
    """(rate, n_samples, n_channels, energy_sq, zero_crossings,
    clip_milli, rms_milli) or all-None when undecodable."""
    none = (None,) * 7
    if payload is None:
        return none
    try:
        rate, samples = decode_audio(payload)
        # inside the try: a payload that decodes but carries a hostile
        # fmt-chunk layout must keep its row with NULL features, not
        # kill the task (r5 advice)
        bits = _wav_bits(bytes(payload))
    except ValueError:
        return none
    n, ch = samples.shape
    if n == 0:
        return none
    s64 = samples.astype(np.int64)
    energy_sq = int((s64 * s64).sum())
    mono = s64.sum(axis=1)
    nonneg = mono >= 0
    zc = int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))
    pos_rail = 32512 if bits == 8 else 32767
    n_clip = int(np.count_nonzero(
        (samples == pos_rail) | (samples == -32768)))
    clip_milli = (1000 * n_clip) // (n * ch)
    mono_energy = int((mono * mono).sum())
    rms_milli = math.isqrt((1_000_000 * mono_energy) // n)
    return (int(rate), n, ch, energy_sq, zc, clip_milli, rms_milli)


def audio_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Binary WAV column -> one feature row per payload."""
    schema = (
        f"{id_col} long, sample_rate long, n_samples long, "
        "n_channels long, energy_sq long, zero_crossings long, "
        "clip_milli long, rms_milli long"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            rows = [audio_feature_row(p) for p in b[payload_col]]
            out = pd.DataFrame(
                rows,
                columns=["sample_rate", "n_samples", "n_channels",
                         "energy_sq", "zero_crossings", "clip_milli",
                         "rms_milli"],
            ).astype("Int64")
            out.insert(0, id_col, b[id_col].values)
            yield out

    return media.mapInPandas(gen, schema)
