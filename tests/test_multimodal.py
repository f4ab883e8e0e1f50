"""Multimodal plumbing: schemas, batch shapes, determinism, and the
stubbed real-decode path raising cleanly."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-mm-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def media(spark):
    from hickoryspark.ops.multimodal import synthetic_media

    return synthetic_media(spark, 24).cache()


def test_featurize_shape_and_determinism(media):
    from hickoryspark.ops.multimodal import FEATURE_DIM, featurize_media

    rows = featurize_media(media).collect()
    assert len(rows) == 24
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    again = {r["media_id"]: r["feature"] for r in featurize_media(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_resize_byte_contract(media):
    from hickoryspark.ops.multimodal import resize_images

    rows = resize_images(media, 16, 8).collect()
    assert len(rows) == 24
    assert all(len(bytes(r["resized"])) == 16 * 8 for r in rows)
    assert all((r["out_w"], r["out_h"]) == (16, 8) for r in rows)


def test_frame_sampling_explodes_rows(media):
    from hickoryspark.ops.multimodal import sample_video_frames

    rows = sample_video_frames(media, n_frames=4).collect()
    assert len(rows) == 24 * 4
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_media.values())


def test_unsupported_formats_raise_cleanly():
    # compressed formats need codec libraries this container lacks —
    # the decoders must say so, not crash obscurely
    from hickoryspark.ops.multimodal import decode_audio, decode_image, sample_frames

    for fn in (decode_image, decode_audio, sample_frames):
        with pytest.raises(ValueError, match="unsupported"):
            fn(b"\x89PNG\r\n\x1a\n garbage")


# -- real codecs: PPM (P6/P3), PCM WAV, PPM-stream video ----------------------

def _checker(h, w):
    import numpy as np

    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[::2, ::2] = [255, 0, 0]
    arr[1::2, 1::2] = [0, 128, 255]
    return arr


def test_ppm_p6_roundtrip_and_p3_equivalence():
    import numpy as np

    from hickoryspark.ops.multimodal import decode_image, encode_ppm

    arr = _checker(6, 4)
    assert np.array_equal(decode_image(encode_ppm(arr)), arr)
    # P3 (ASCII) with comments and odd whitespace decodes to the same pixels
    flat = " ".join(str(v) for v in arr.flatten())
    p3 = f"P3 # comment\n4 6 # dims\n255\n{flat}\n".encode()
    assert np.array_equal(decode_image(p3), arr)
    # maxval scaling: a maxval-15 P3 sample of 15 is full brightness
    assert decode_image(b"P3 1 1 15 15 0 7")[0, 0].tolist() == [255, 0, 119]
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"P6\n2 2\n255\n\x00\x00\x00")


def test_wav_roundtrip_mono_stereo_and_8bit():
    import numpy as np

    from hickoryspark.ops.multimodal import decode_audio, encode_wav

    mono = (np.sin(np.arange(200) / 7.0) * 12000).astype(np.int16)
    rate, out = decode_audio(encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(out[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1)
    rate, out = decode_audio(encode_wav(stereo, 44100))
    assert rate == 44100 and out.shape == (200, 2)
    assert np.array_equal(out, stereo)
    # 8-bit unsigned PCM: hand-built header, centered to int16
    import struct

    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data) + 1)
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data + b"\x00")
    rate, out = decode_audio(wav)
    assert out[:, 0].tolist() == [(-128) << 8, 0, 127 << 8]


def test_ppm_stream_frame_sampling():
    import numpy as np

    from hickoryspark.ops.multimodal import encode_ppm, sample_frames

    frames = [_checker(4, 4)] + [
        np.full((4, 4, 3), i, dtype=np.uint8) for i in range(1, 5)
    ]
    stream = b"".join(encode_ppm(f) for f in frames)
    got = sample_frames(stream, every_n=2)
    assert [idx for idx, _ in got] == [0, 2, 4]
    assert np.array_equal(got[1][1], frames[2])


def test_resize_real_pixels(spark):
    import numpy as np

    from hickoryspark.ops.multimodal import decode_image, encode_ppm, resize_images

    arr = _checker(8, 8)
    media = spark.createDataFrame(
        [(0, "image", encode_ppm(arr), {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    rows = resize_images(media, 4, 4, use_fake=False).collect()
    out = decode_image(bytes(rows[0]["resized"]))
    yi = (np.arange(4) * 8) // 4
    xi = (np.arange(4) * 8) // 4
    assert np.array_equal(out, arr[yi][:, xi])


def test_featurize_real_codecs(spark):
    import numpy as np

    from hickoryspark.ops.multimodal import (
        FEATURE_DIM,
        encode_ppm,
        encode_wav,
        featurize_media,
    )

    img = encode_ppm(_checker(8, 8))
    wav = encode_wav((np.arange(100) * 300 - 15000).astype(np.int16), 8000)
    vid = encode_ppm(_checker(4, 4)) + encode_ppm(_checker(4, 4))
    media = spark.createDataFrame(
        [(0, "image", img, {}), (1, "audio", wav, {}), (2, "video", vid, {})],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    rows = {r["media_id"]: r for r in
            featurize_media(media, use_fake=False).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert len(r["feature"]) == FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 1e-5  # normalized histogram
    # image and first-video-frame features differ only via resolution
    assert rows[0]["n_bytes"] == len(img)
