"""Content-defined chunking (ops/cdc.py)."""

from __future__ import annotations

import hashlib
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ref_chunks(data: bytes, min_size: int, mask_bits: int,
                max_size: int):
    """INDEPENDENT per-byte reference: the sequential gear recurrence
    + greedy cut walk, no NumPy, no import from the op."""
    if not data:
        return []
    gear = [int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "big")
            for b in range(256)]
    mask = (1 << mask_bits) - 1
    h = 0
    cand = []
    for i, b in enumerate(data):
        h = ((h << 1) + gear[b]) & ((1 << 64) - 1)
        if h & mask == 0:
            cand.append(i)
    n = len(data)
    out, start = [], 0
    while start < n:
        window = [c for c in cand
                  if start + min_size - 1 <= c <= start + max_size - 1]
        if window and window[0] <= n - 1:
            cut = window[0]
        elif start + max_size - 1 < n - 1:
            cut = start + max_size - 1
        else:
            break
        out.append((start, cut - start + 1))
        start = cut + 1
    if start < n:
        out.append((start, n - start))
    return out


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-cdc-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_vectorized_matches_reference_fuzz():
    from hickoryspark.ops.cdc import chunk_boundaries_ref

    rng = random.Random(13)
    for trial in range(60):
        n = rng.choice([0, 1, 63, 64, 65, 200, 1000, 3000])
        data = bytes(rng.randrange(256) for _ in range(n))
        mb = rng.choice([3, 4, 6])
        mx = rng.choice([128, 256, 1024])
        got = chunk_boundaries_ref(data, 64, mb, mx)
        assert got == _ref_chunks(data, 64, mb, mx), (trial, n, mb, mx)


def test_partition_invariants():
    from hickoryspark.ops.cdc import chunk_boundaries_ref

    rng = random.Random(99)
    data = bytes(rng.randrange(256) for _ in range(5000))
    chunks = chunk_boundaries_ref(data, 64, 5, 256)
    assert chunks[0][0] == 0
    for (o1, l1), (o2, _) in zip(chunks, chunks[1:]):
        assert o1 + l1 == o2
    assert sum(l for _, l in chunks) == len(data)
    for off, ln in chunks[:-1]:
        assert 64 <= ln <= 256
    assert chunks[-1][1] <= 256


def test_shift_resistance_vs_fixed_blocking():
    from hickoryspark.ops.cdc import chunk_boundaries_ref

    rng = random.Random(5)
    data = bytes(rng.randrange(256) for _ in range(4000))
    shifted = b"X" + data

    def digests(d):
        return [hashlib.md5(d[o:o + ln]).hexdigest()
                for o, ln in chunk_boundaries_ref(d, 64, 5, 512)]

    a, b = set(digests(data)), set(digests(shifted))
    # all but the first few chunks re-align after the insertion
    assert len(a & b) >= len(a) - 3
    # fixed-size blocking shares (almost) nothing after a 1-byte shift
    fixed_a = {hashlib.md5(data[i:i + 128]).hexdigest()
               for i in range(0, len(data), 128)}
    fixed_b = {hashlib.md5(shifted[i:i + 128]).hexdigest()
               for i in range(0, len(shifted), 128)}
    assert len(fixed_a & fixed_b) <= 1


def test_spark_op_end_to_end(spark):
    from hickoryspark.ops.cdc import content_chunks

    texts = {1: "para one. " * 40, 2: "", 4: "z" * 300}
    rows = [(1, texts[1]), (2, texts[2]), (3, None), (4, texts[4])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 content_chunks(df, min_size=64, mask_bits=4,
                                max_size=256).collect())
    exp = []
    for d in (1, 2, 4):
        raw = texts[d].encode()
        for ci, (o, ln) in enumerate(_ref_chunks(raw, 64, 4, 256)):
            exp.append((d, ci, o, ln,
                        hashlib.md5(raw[o:o + ln]).hexdigest()))
    assert got == sorted(exp)
    assert not [r for r in got if r[0] in (2, 3)]


def test_param_validation(spark):
    from hickoryspark.ops.cdc import content_chunks

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        content_chunks(df, min_size=32)
    with pytest.raises(ValueError):
        content_chunks(df, min_size=64, max_size=63)
