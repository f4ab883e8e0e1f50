"""Audio fingerprint near-dup (ops/audiofp.py)."""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _wav_for_bits(bits: int, base: int = 2000, step: int = 3,
                  frame_len: int = 16, gain: int = 1,
                  channels: int = 1, rate: int = 8000) -> bytes:
    """65 constant frames whose level walk encodes the 64 delta
    bits."""
    from hickoryspark.ops.multimodal import encode_wav

    levels = [base]
    for i in range(64):
        levels.append(levels[-1]
                      + (step if (bits >> i) & 1 else -step))
    samples = np.repeat(np.array(levels, dtype=np.int64) * gain,
                        frame_len)
    if channels == 2:
        samples = np.stack([samples, samples], axis=1)
    return encode_wav(samples.astype(np.int16), rate)


def test_bits_roundtrip_and_invariances():
    from hickoryspark.ops.audiofp import audio_fp_bits

    rng = random.Random(3)
    for _ in range(10):
        bits = rng.getrandbits(64)
        assert audio_fp_bits(_wav_for_bits(bits)) == bits
        assert audio_fp_bits(_wav_for_bits(bits, gain=5)) == bits
        assert audio_fp_bits(_wav_for_bits(bits, channels=2)) == bits
        assert audio_fp_bits(_wav_for_bits(bits, frame_len=7,
                                           rate=44100)) == bits


def test_unframeable_and_garbage_are_none():
    from hickoryspark.ops.audiofp import audio_fp_bits
    from hickoryspark.ops.multimodal import encode_wav

    short = encode_wav(np.arange(64, dtype=np.int16), 8000)
    assert audio_fp_bits(short) is None
    assert audio_fp_bits(b"not a wav at all") is None
    ok = encode_wav(np.arange(65, dtype=np.int16), 8000)
    assert audio_fp_bits(ok) is not None


def test_spark_pairs_vs_bruteforce(spark_session=None):
    from hickoryspark.ops.audiofp import (audio_fingerprints,
                                          audio_near_pairs)
    from hickoryspark.spark.session import get_spark

    spark = get_spark(4, app_name="hickoryspark-audiofp-tests",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    base = 0x5A5A5A5A5A5A5A5A
    sigs = {
        1: base,
        2: base ^ 0b1,               # hamming 1 from base
        3: base ^ 0b110,             # hamming 2 from base, 3 from 2
        4: base ^ (0xFF << 20),      # far from all
        5: base,                     # exact dup of 1
    }
    rows = [(i, bytearray(_wav_for_bits(s))) for i, s in sigs.items()]
    rows.append((6, None))
    media = spark.createDataFrame(
        rows, "media_id long, payload binary")
    got = sorted(tuple(r) for r in audio_near_pairs(
        audio_fingerprints(media), max_hamming=2,
        group_cap=None).collect())
    exp = []
    ids = sorted(sigs)
    for i in ids:
        for j in ids:
            if i < j:
                h = bin(sigs[i] ^ sigs[j]).count("1")
                if h <= 2:
                    exp.append((i, j, h))
    assert got == sorted(exp)


def test_out_of_phase_stereo_matches_mono():
    # pinned: mono = sum of |sample| across channels, NOT |L+R| —
    # phase-inverted stereo must fingerprint like the mono track
    import numpy as np

    from hickoryspark.ops.audiofp import audio_fp_bits
    from hickoryspark.ops.multimodal import encode_wav

    rng = random.Random(17)
    bits = rng.getrandbits(64)
    levels = [2000]
    for i in range(64):
        levels.append(levels[-1] + (3 if (bits >> i) & 1 else -3))
    mono = np.repeat(np.array(levels, dtype=np.int64), 16)
    inv = np.stack([mono, -mono], axis=1)
    assert audio_fp_bits(encode_wav(mono.astype(np.int16), 8000)) == bits
    assert audio_fp_bits(encode_wav(inv.astype(np.int16), 8000)) == bits
