"""TextTiling (ops/texttiling.py): hand-derived block scores and
depths, plateau climb, boundary rule, partial final chunk, edge
cases, Spark path."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.texttiling import tile_scores  # noqa: E402


def test_two_topic_doc():
    # ps = [x x][x x][y y][y y], w=2 k=2 — hand-derived:
    # gap1: L={x:2} R={x:2,y:2} dot=4 na2=4 nb2=8 -> 1000*16//32 = 500
    # gap2: {x:4} vs {y:4} -> 0; gap3 symmetric to gap1 -> 500
    # depths: only gap2 climbs to 500 both sides -> 1000; mean=333
    toks = ["x"] * 4 + ["y"] * 4
    assert tile_scores(toks, w=2, k=2) == [
        (1, 500, 0, 0), (2, 0, 1000, 1), (3, 500, 0, 0)]


def test_plateau_climb():
    # ps = [xx][xx][zz][yy][yy]: gaps 500,0,0,500 — the depth climb
    # crosses the flat 0 at the neighbouring gap, so BOTH middle gaps
    # get depth 1000 and both are boundaries (mean = 500).
    toks = ["x"] * 4 + ["z", "z"] + ["y"] * 4
    assert tile_scores(toks, w=2, k=2) == [
        (1, 500, 0, 0), (2, 0, 1000, 1), (3, 0, 1000, 1),
        (4, 500, 0, 0)]


def test_partial_final_chunk_kept():
    # 5 tokens, w=2 -> ps [aa][aa][a]: identical vocab, cosine^2=1000
    got = tile_scores(["a"] * 5, w=2, k=2)
    assert [s for _, s, _, _ in got] == [1000, 1000]
    assert all(b == 0 for _, _, _, b in got)  # flat: no boundary


def test_edges():
    assert tile_scores([], w=2, k=2) == []
    assert tile_scores(["a"], w=2, k=2) == []
    assert tile_scores(["a", "b"], w=2, k=2) == []  # single ps


def test_block_bounded_by_k():
    # k=1: gap2 of [xx][xy][yy] compares only adjacent ps
    got = tile_scores(["x", "x", "x", "y", "y", "y"], w=2, k=1)
    # gap1: {x:2} vs {x:1,y:1}: dot=2 na2=4 nb2=2 -> 4000//8=500
    # gap2: {x:1,y:1} vs {y:2}: dot=2 -> 500
    assert [(g, s) for g, s, _, _ in got] == [(1, 500), (2, 500)]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-tiling-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_spark_path(spark):
    from hickoryspark.ops.texttiling import text_tiles

    docs = spark.createDataFrame(
        [(1, "x x x x y y y y"),
         (2, None),
         (3, "a b"),
         (4, "a b c d")],  # NBSP is NOT ASCII ws: one token 'a\xa0b'
        "doc_id long, text string")
    got = sorted(tuple(r) for r in text_tiles(docs, w=2, k=2).collect())
    assert got == [
        (1, 1, 500, 0, 0), (1, 2, 0, 1000, 1), (1, 3, 500, 0, 0),
        (4, 1, 0, 0, 0),
    ]
