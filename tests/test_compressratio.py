"""Compression-ratio signal (ops/compressratio.py)."""

from __future__ import annotations

import os
import sys
import zlib

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-compressratio-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, rows, **kw):
    from hickoryspark.ops.compressratio import compression_signal

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(tuple(r) for r in
                  compression_signal(df, **kw).collect())


def test_exact_against_zlib(spark):
    texts = {1: "aaaa" * 50, 2: "the quick brown fox jumps 123",
             3: "é中文 mixed"}
    got = _run(spark, list(texts.items()))
    exp = []
    for d, t in sorted(texts.items()):
        raw = t.encode("utf-8")
        c = len(zlib.compress(raw, 6))
        exp.append((d, len(raw), c, 1000 * c // len(raw)))
    assert got == exp


def test_empty_text_null_ratio_and_null_text_skipped(spark):
    got = _run(spark, [(1, ""), (2, None), (3, "xy")])
    c0 = len(zlib.compress(b"", 6))
    c3 = len(zlib.compress(b"xy", 6))
    assert got == [(1, 0, c0, None), (3, 2, c3, 1000 * c3 // 2)]


def test_level_pinned(spark):
    t = "repetition " * 100
    got1 = _run(spark, [(1, t)], level=1)
    got9 = _run(spark, [(1, t)], level=9)
    assert got1[0][2] == len(zlib.compress(t.encode(), 1))
    assert got9[0][2] == len(zlib.compress(t.encode(), 9))


def test_repetitive_compresses_below_prose(spark):
    rep = "spam spam spam " * 40
    prose = ("A different idea appears in every clause here, with "
             "varied vocabulary, digressions, and no repeated "
             "phrasing to exploit whatsoever; entropy stays high.")
    got = dict((r[0], r[3]) for r in
               _run(spark, [(1, rep), (2, prose)]))
    assert got[1] < got[2]
