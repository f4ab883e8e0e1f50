"""Audio fingerprint near-dup (energy-delta signature).

The audio twin of ops/imagehash.py: a 64-bit gain-invariant
fingerprint in the Chromaprint/Shazam lineage — the bit pattern is
the SIGN of the frame-to-frame energy delta, which survives volume
changes, re-encoding to a different PCM width, and mono/stereo
duplication, the transformations that defeat byte-level dedup of
crawled audio.

Pinned semantics:

- Decode via the real PCM WAV codec (ops/multimodal.decode_audio);
  undecodable payloads fingerprint to NULL.
- ``mono[i]`` = sum across channels of ``|sample|`` (int64 — no
  division; DELIBERATELY the magnitude sum, not ``|L+R|``:
  out-of-phase stereo would cancel to silence under a downmix-first
  rule, while the magnitude sum fingerprints it identically to the
  mono track).
- 65 frames over the n samples on the integer grid (frame f spans
  ``[f*n//65, (f+1)*n//65)``, the aHash cell arithmetic); n < 65
  → NULL (no meaningful framing).
- ``E_f`` = sum of ``mono`` over frame f; bit i (LSB-first,
  i = 0..63) is 1 iff ``E_{i+1} * len_i > E_i * len_{i+1}`` (strict
  exact-integer mean comparison — invariant under any positive gain,
  channel duplication, and 8→16-bit widening up to codec rounding).
- Signed-64 packing matches ops/dedup.simhash, so
  ``bit_count(a XOR b)`` Hamming is exact in both engines.

Pair join: delegates to the shared pigeonhole-banded joiner
(ops/dedup.simhash_pairs_from_sigs) — same recall guarantee and skew
caps as the text SimHash and image aHash paths.

Scale shape: one mapInPandas pass to fingerprint; the join is the
banded shuffle. Reference for the fingerprint family:
Haitsma & Kalker, "A Highly Robust Audio Fingerprinting System"
(ISMIR 2002) — sign-of-energy-difference bits.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.dedup import (DEFAULT_GROUP_CAP,
                                    simhash_pairs_from_sigs)
from hickoryspark.ops.imagehash import _to_signed64
from hickoryspark.ops.multimodal import decode_audio

__all__ = ["audio_fp_bits", "audio_fingerprints", "audio_near_pairs",
           "N_FRAMES"]

N_FRAMES = 65  # 64 delta bits


def audio_fp_bits(payload: bytes) -> Optional[int]:
    """64-bit fingerprint of a PCM WAV payload as an unsigned Python
    int, or None when undecodable / shorter than 65 samples."""
    try:
        _rate, samples = decode_audio(payload)
    except ValueError:
        return None
    n = samples.shape[0]
    if n < N_FRAMES:
        return None
    mono = np.abs(samples.astype(np.int64)).sum(axis=1)
    fb = (np.arange(N_FRAMES) * n) // N_FRAMES
    energies = np.add.reduceat(mono, fb)
    lens = np.diff(np.append(fb, n)).astype(np.int64)
    e, ln = energies.tolist(), lens.tolist()
    v = 0
    for i in range(N_FRAMES - 1):
        if e[i + 1] * ln[i] > e[i] * ln[i + 1]:
            v |= 1 << i
    return v


def audio_fingerprints(media: DataFrame, id_col: str = "media_id",
                       payload_col: str = "payload") -> DataFrame:
    """(id, afp BIGINT) for a binary WAV column; NULL for
    undecodable / too-short payloads."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if not len(b):
                continue
            out = []
            for payload in b[payload_col]:
                bits = (None if payload is None
                        else audio_fp_bits(bytes(payload)))
                out.append(None if bits is None else _to_signed64(bits))
            yield pd.DataFrame(
                {id_col: b[id_col],
                 "afp": pd.array(out, dtype="Int64")}
            )

    return media.mapInPandas(gen, f"{id_col} long, afp long")


def audio_near_pairs(
    fps: DataFrame,
    max_hamming: int = 2,
    group_cap: int | None = DEFAULT_GROUP_CAP,
    id_col: str = "media_id",
) -> DataFrame:
    """Complete (id_a, id_b, hamming) pair set at Hamming <=
    max_hamming between fingerprints; NULL fingerprints match
    nothing."""
    sigs = fps.where(F.col("afp").isNotNull()).select(
        F.col(id_col).alias("doc_id"), F.col("afp").alias("simhash")
    )
    out = simhash_pairs_from_sigs(sigs, 64, max_hamming, group_cap)
    return out.select(
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        "hamming",
    )
