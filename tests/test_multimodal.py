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


def test_real_decode_paths_are_stubbed():
    from hickoryspark.ops.multimodal import decode_audio, decode_image, sample_frames

    for fn in (decode_image, decode_audio, sample_frames):
        with pytest.raises(NotImplementedError):
            fn(b"\x00\x01")
