"""WordPiece encoding (ops/wordpiece.py): the BERT reference
behaviors — longest-match-first, ## continuations, whole-word [UNK]
on any dead end, length bound — plus the Spark path."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.wordpiece import UNK, wordpiece_encode  # noqa: E402

VOCAB = {"un", "##aff", "##able", "##ected", "aff", "affable",
         "want", "##ed", "##want", "wa", "##nt"}


def test_longest_match_first():
    # BERT's canonical example shape: greedy takes the longest prefix
    assert wordpiece_encode("unaffable", VOCAB) == [
        "un", "##aff", "##able"]
    assert wordpiece_encode("unaffected", VOCAB) == [
        "un", "##aff", "##ected"]
    # 'affable' matches whole before 'aff'+'##able'
    assert wordpiece_encode("affable", VOCAB) == ["affable"]
    # 'want' whole-word beats 'wa'+'##nt'
    assert wordpiece_encode("wanted", VOCAB) == ["want", "##ed"]


def test_unk_on_dead_end():
    # greedy is NOT backtracking: no salvage once a position fails
    assert wordpiece_encode("unz", VOCAB) == [UNK]
    assert wordpiece_encode("", VOCAB) == [UNK]
    assert wordpiece_encode("xyz", VOCAB) == [UNK]


def test_length_bound():
    long_word = "un" + "aff" * 60
    assert wordpiece_encode(long_word, VOCAB, max_word_chars=100) == [UNK]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-wp-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_encode_df(spark):
    from hickoryspark.ops.wordpiece import wordpiece_encode_df

    df = spark.createDataFrame(
        [(1, "unaffable"), (2, "xyz"), (3, None)],
        "doc_id long, word string")
    rows = sorted(
        (r["doc_id"], r["piece_pos"], r["piece"])
        for r in wordpiece_encode_df(df, sorted(VOCAB)).collect())
    assert rows == [
        (1, 0, "un"), (1, 1, "##aff"), (1, 2, "##able"),
        (2, 0, UNK),
    ]
