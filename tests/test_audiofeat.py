"""Audio features: exact arithmetic vs hand computation on known
waveforms, stereo cancellation, clipping, and the NULL contract."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _square(n, p, a):
    return np.where((np.arange(n) // p) % 2 == 0, a, -a).astype(np.int16)


def test_square_wave_hand_computed():
    from hickoryspark.ops.audiofeat import audio_feature_row
    from hickoryspark.ops.multimodal import encode_wav

    n, p, a = 200, 5, 1200
    row = audio_feature_row(encode_wav(_square(n, p, a), 8000))
    rate, ns, ch, e, zc, clip, rms = row
    assert (rate, ns, ch) == (8000, n, 1)
    assert e == n * a * a
    assert zc == (n - 1) // p
    assert clip == 0
    assert rms == 1000 * a


def test_stereo_cancellation_and_clipping():
    from hickoryspark.ops.audiofeat import audio_feature_row
    from hickoryspark.ops.multimodal import encode_wav

    n, a = 64, 2000
    left = _square(n, 4, a)
    stereo = np.stack([left, (-left).astype(np.int16)], axis=1)
    rate, ns, ch, e, zc, clip, rms = audio_feature_row(
        encode_wav(stereo, 16000))
    assert ch == 2 and e == 2 * n * a * a
    assert rms == 0 and zc == 0  # out-of-phase cancels the mono stream

    clipped = np.full(50, 32767, dtype=np.int16)
    row = audio_feature_row(encode_wav(clipped, 8000))
    assert row[5] == 1000 and row[6] == 32767000


def test_undecodable_yields_nulls():
    from hickoryspark.ops.audiofeat import audio_feature_row

    assert audio_feature_row(b"JUNKJUNKJUNK") == (None,) * 7
    assert audio_feature_row(None) == (None,) * 7


def test_spark_path_nulls_and_values():
    from hickoryspark.spark.session import get_spark
    from hickoryspark.ops.audiofeat import audio_features
    from hickoryspark.ops.multimodal import encode_wav

    spark = get_spark(4, app_name="audiofeat-tests", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [
        (0, bytearray(encode_wav(_square(100, 2, 500), 8000))),
        (1, bytearray(b"nope")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in audio_features(df).collect()}
    assert out[0]["rms_milli"] == 500000 and out[0]["zero_crossings"] == 49
    assert out[1]["rms_milli"] is None and out[1]["n_samples"] is None


def test_8bit_positive_rail_clipping_detected():
    # review finding: 8-bit widening maps 0xFF to 32512, not 32767 —
    # the clip audit must use the source format's rails
    import struct

    from hickoryspark.ops.audiofeat import audio_feature_row

    def wav8(raw: bytes) -> bytes:
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        chunks = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", len(raw)) + raw)
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    row_pos = audio_feature_row(wav8(b"\xff" * 40))
    assert row_pos[5] == 1000  # clip_milli: positive rail counted
    row_neg = audio_feature_row(wav8(b"\x00" * 40))
    assert row_neg[5] == 1000
    row_mid = audio_feature_row(wav8(b"\x80" * 40))
    assert row_mid[5] == 0


def test_dual_fmt_and_short_fmt_keep_row_null_or_consistent():
    # r5 advice: _wav_bits must mirror decode_audio's walk (LAST fmt,
    # len>=16 check) and run inside the try — a crafted WAV with a
    # short or conflicting first fmt chunk must not kill the task or
    # use the wrong clip rail
    import struct

    from hickoryspark.ops.audiofeat import audio_feature_row

    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    raw = b"\xff" * 40
    # short first fmt (4 bytes) + valid 8-bit fmt later: decode_audio
    # uses the LAST fmt and decodes fine; _wav_bits must follow suit
    short_first = (
        b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
        + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    row = audio_feature_row(short_first)
    assert row[0] == 8000 and row[5] == 1000  # 8-bit rail applied

    # dual fmt with DIFFERING depths: last one (8-bit) must drive both
    # the decode and the clip rail — no silent 16-bit rail
    fmt16 = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    dual = (
        b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt16)) + fmt16
        + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    row = audio_feature_row(dual)
    assert row[5] == 1000
