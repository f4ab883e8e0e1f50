"""Stylometry ops: dense zero-inclusive profiles, exact rate
arithmetic, and burstiness vs a hand computation."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-stylometry-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_profile_is_dense_and_exact(spark):
    from hickoryspark.ops.stylometry import function_word_profile

    df = spark.createDataFrame(
        [(0, "the cat and the dog"), (1, "no closed class words here")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["word"]): (r["n"], r["rate_e4"])
           for r in function_word_profile(df, ("the", "and", "of")).collect()}
    assert len(out) == 6  # dense: 2 docs x 3 words
    assert out[(0, "the")] == (2, 4000)   # 2 of 5 tokens
    assert out[(0, "and")] == (1, 2000)
    assert out[(0, "of")] == (0, 0)       # zero row present
    assert out[(1, "the")] == (0, 0)


def test_empty_text_guard(spark):
    from hickoryspark.ops.stylometry import function_word_profile

    df = spark.createDataFrame([(0, "")], "doc_id long, text string")
    out = function_word_profile(df, ("the",)).collect()
    # split('') -> [''] : 1 token, zero hits, no div-by-zero
    assert [(r["n"], r["rate_e4"]) for r in out] == [(0, 0)]


def test_burstiness_hand_computed(spark):
    from hickoryspark.ops.stylometry import term_burstiness

    df = spark.createDataFrame(
        [
            (0, "x x x x y"),   # x clumps: cf 4 in one doc
            (1, "y z"),
            (2, "y z"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: (r["cf"], r["df"], r["burst_milli"])
           for r in term_burstiness(df, min_cf=2, top_k=10).collect()}
    assert out["x"] == (4, 1, 4000)
    assert out["y"] == (3, 3, 1000)
    assert out["z"] == (2, 2, 1000)
    # ordering: x first (burst), then y (cf 3) before z (cf 2)
    ordered = [r["term"] for r in
               term_burstiness(df, min_cf=2, top_k=10).collect()]
    assert ordered == ["x", "y", "z"]
