"""Perceptual image hashing (ops/imagehash.py): exact bit layout,
brightness-shift invariance, block-mean grid, NULL handling, and
end-to-end near-pair recall vs a brute-force python oracle."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-imagehash-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _img_from_bits(value: int, offset: int = 0, jitter=None) -> np.ndarray:
    """16x16 gray image whose 2x2 blocks encode the 64 bits of value
    (LSB-first, row-major), bright=200 / dark=56, plus a constant
    brightness offset and optional per-pixel jitter array."""
    bits = np.array([(value >> i) & 1 for i in range(64)]).reshape(8, 8)
    img = np.kron(bits, np.ones((2, 2), dtype=np.int64)) * 144 + 56 + offset
    if jitter is not None:
        img = img + jitter
    return np.repeat(img[:, :, None], 3, axis=2).astype(np.uint8)


def test_ahash_exact_bit_layout_and_brightness_invariance():
    from hickoryspark.ops.imagehash import ahash_bits

    value = 0x0123456789ABCDEF
    rng = np.random.RandomState(7)
    jitter = rng.randint(-3, 4, size=(16, 16))
    assert ahash_bits(_img_from_bits(value)) == value
    assert ahash_bits(_img_from_bits(value, offset=30)) == value
    assert ahash_bits(_img_from_bits(value, offset=11, jitter=jitter)) == value


def test_ahash_block_means_uneven_grid():
    """17x19 image (not divisible by 8): integer-grid block means must
    still separate a half-bright image into the right bit halves."""
    from hickoryspark.ops.imagehash import ahash_bits

    img = np.zeros((17, 19, 3), dtype=np.uint8)
    img[:8, :, :] = 200       # top ~half bright
    img[8:, :, :] = 56
    got = ahash_bits(img)
    # rows 0..3 of the 8x8 cell grid are fully in the bright half
    for i in range(24):
        assert (got >> i) & 1 == 1
    for i in range(40, 64):
        assert (got >> i) & 1 == 0


def test_ahash_constant_image_and_small_image():
    from hickoryspark.ops.imagehash import ahash_bits

    const = np.full((16, 16, 3), 120, dtype=np.uint8)
    assert ahash_bits(const) == 0          # strict > threshold
    tiny = np.full((4, 4, 3), 120, dtype=np.uint8)
    assert ahash_bits(tiny) is None        # smaller than the cell grid


def test_ahash_images_nulls_and_sign_bit(spark):
    from hickoryspark.ops.multimodal import encode_ppm

    from hickoryspark.ops.imagehash import ahash_images

    top = (1 << 63) | 5                    # bit 63 set -> negative BIGINT
    rows = [
        (1, encode_ppm(_img_from_bits(top))),
        (2, b"not a ppm"),
        (3, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["ahash"] for r in ahash_images(media).collect()}
    assert got[1] == top - (1 << 64)       # two's complement
    assert got[2] is None and got[3] is None


def test_ahash_near_pairs_end_to_end_recall(spark):
    """36 synthetic images from 64-bit patterns with known pairwise
    hammings; the banded pair set must equal the brute-force oracle."""
    from hickoryspark.ops.multimodal import encode_ppm

    from hickoryspark.ops.imagehash import ahash_images, ahash_near_pairs

    rng = np.random.RandomState(42)
    base = int(rng.randint(0, 2**31)) | (int(rng.randint(0, 2**31)) << 31)
    vals = []
    for i in range(36):
        v = base
        for _ in range(i % 5):             # flip 0..4 random bits
            v ^= 1 << int(rng.randint(0, 64))
        vals.append(v)
    media = spark.createDataFrame(
        [(i, encode_ppm(_img_from_bits(v, offset=i % 17)))
         for i, v in enumerate(vals)],
        "media_id long, payload binary",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_pairs(
            ahash_images(media), max_hamming=3, group_cap=None
        ).collect()
    }
    want = {}
    for a in range(36):
        for b in range(a + 1, 36):
            d = bin(vals[a] ^ vals[b]).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got == want and len(want) > 10


def test_near_pairs_narrow_hash_bands_scale_to_width(spark):
    """hash_size=4 signatures band over 16 bits, not 64 (regression:
    a fixed bits=64 made the high bands all-zero -> every image
    collided there). Pairs must still be exactly the brute force."""
    from hickoryspark.ops.multimodal import encode_ppm

    from hickoryspark.ops.imagehash import ahash_images, ahash_near_pairs

    vals = [0x0F0F, 0x0F0E, 0xF0F0, 0x1234, 0x1235, 0xFFFE]
    imgs = []
    for i, v in enumerate(vals):
        bits = np.array([(v >> b) & 1 for b in range(16)]).reshape(4, 4)
        img = np.kron(bits, np.ones((2, 2), dtype=np.int64)) * 144 + 56
        imgs.append((i, encode_ppm(
            np.repeat(img[:, :, None], 3, axis=2).astype(np.uint8))))
    media = spark.createDataFrame(imgs, "media_id long, payload binary")
    hashes = ahash_images(media, hash_size=4)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in ahash_near_pairs(
               hashes, max_hamming=2, hash_size=4, group_cap=None
           ).collect()}
    want = {}
    for a in range(6):
        for b in range(a + 1, 6):
            d = bin(vals[a] ^ vals[b]).count("1")
            if d <= 2:
                want[(a, b)] = d
    assert got == want and len(want) >= 2


# ---------------------------------------------------------------------------
# dHash


def test_dhash_bits_per_bit_reference():
    import numpy as np

    from hickoryspark.ops.imagehash import dhash_bits

    rng = np.random.default_rng(7)
    for _ in range(5):
        arr = rng.integers(0, 256, size=(16, 18, 3), dtype=np.uint8)
        got = dhash_bits(arr, 8)
        gray = arr.astype(np.float64).mean(axis=2)
        # independent per-cell means over the same integer grid
        want = 0
        for r in range(8):
            r0, r1 = r * 16 // 8, (r + 1) * 16 // 8
            means = []
            for c in range(9):
                c0, c1 = c * 18 // 9, (c + 1) * 18 // 9
                means.append(gray[r0:r1, c0:c1].mean())
            for c in range(8):
                if means[c + 1] > means[c]:
                    want |= 1 << (r * 8 + c)
        assert got == want


def test_dhash_brightness_offset_invariant():
    import numpy as np

    from hickoryspark.ops.imagehash import dhash_bits

    rng = np.random.default_rng(3)
    arr = rng.integers(40, 200, size=(16, 18, 3), dtype=np.uint8)
    shifted = np.clip(arr.astype(np.int64) + 30, 0, 255).astype(np.uint8)
    assert dhash_bits(arr) == dhash_bits(shifted)


def test_dhash_too_small_is_none():
    import numpy as np

    from hickoryspark.ops.imagehash import dhash_bits

    # width must cover n+1 cells: an 8x8 image cannot dHash at n=8
    assert dhash_bits(np.zeros((8, 8, 3), dtype=np.uint8), 8) is None
    assert dhash_bits(np.zeros((8, 9, 3), dtype=np.uint8), 8) is not None
