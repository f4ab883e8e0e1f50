"""Gale-Church-style sentence alignment (ops/align.py): bead choice,
tie rule, coverage invariant, empty sides, Spark path."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.align import align_lengths  # noqa: E402


def test_one_to_one_equal():
    assert align_lengths([2, 4], [2, 4]) == [
        (0, 1, 0, 1, 0), (1, 1, 1, 1, 0)]


def test_merge_beats_deletion():
    # 1-2: cost(4,4)=0+100 beats 1-1 cost(4,2)=28 + 0-1 195+66
    assert align_lengths([4], [2, 2]) == [(0, 1, 0, 2, 100)]
    assert align_lengths([2, 2], [4]) == [(0, 2, 0, 1, 100)]


def test_deletion_sides():
    assert align_lengths([], [2]) == [(0, 0, 0, 1, 195 + 66)]
    assert align_lengths([3], []) == [(0, 1, 0, 0, 195 + 75)]
    assert align_lengths([], []) == []


def test_cheaper_small_beads_beat_merge():
    # src [0,0] tgt [0,0]: 1-1,1-1 total 0 strictly beats 2-2 (191)
    # — no tie involved (see test_real_tie_largest_bead_wins for the
    # pinned equal-cost rule).
    assert align_lengths([0, 0], [0, 0]) == [
        (0, 1, 0, 1, 0), (1, 1, 1, 1, 0)]


def test_coverage_invariant():
    src = [5, 1, 9, 4, 4, 7, 2]
    tgt = [5, 10, 3, 1, 7, 2]
    beads = align_lengths(src, tgt)
    s_seen, t_seen = [], []
    for a, sn, b, tn, _ in beads:
        assert a == len(s_seen) and b == len(t_seen)
        s_seen.extend(range(a, a + sn))
        t_seen.extend(range(b, b + tn))
    assert s_seen == list(range(len(src)))
    assert t_seen == list(range(len(tgt)))


def test_large_pair_terminates():
    src = [(i * 7) % 13 + 1 for i in range(200)]
    beads = align_lengths(src, src)
    # identical sequences align fully 1-1 at zero cost
    assert all(sn == 1 and tn == 1 and c == 0
               for _, sn, _, tn, c in beads)
    assert len(beads) == 200


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-align-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_spark_path(spark):
    from hickoryspark.ops.align import align_sentence_pairs

    pairs = spark.createDataFrame(
        [(1, ["ab", "cdef"], ["xy", "zwvu"]),
         (2, ["abcd"], ["xy", "zw"]),
         (3, None, ["zz"])],
        "pair_id long, src array<string>, tgt array<string>")
    got = sorted(tuple(r) for r in align_sentence_pairs(pairs).collect())
    assert got == [
        (1, 0, 0, 1, 0, 1, 0), (1, 1, 1, 1, 1, 1, 0),
        (2, 0, 0, 1, 0, 2, 100),
        (3, 0, 0, 0, 0, 1, 261),
    ]


def test_real_tie_largest_bead_wins():
    # regression (r5 review): 1-1,1-1 and 2-2 both cost 191 here
    # ((2,69) vs (72,0): 2-2 match cost 0 + 191; 1-1 pair costs
    # |2-72|*100//75 = 93 + |69-0|*100//70 = 98 = 191). The pinned
    # rule keeps the FIRST writer = the largest bead: one 2-2.
    assert align_lengths([2, 69], [72, 0]) == [(0, 2, 0, 2, 191)]


def test_null_sentence_elements(spark):
    from hickoryspark.ops.align import align_sentence_pairs

    pairs = spark.createDataFrame(
        [(1, ["ab", None], ["xy", ""])],
        "pair_id long, src array<string>, tgt array<string>")
    got = sorted(tuple(r)
                 for r in align_sentence_pairs(pairs).collect())
    # NULL element = length-0 sentence: aligns like the empty string
    assert got == [(1, 0, 0, 1, 0, 1, 0), (1, 1, 1, 1, 1, 1, 0)]
