"""N-gram LM counts (ops/lm.py) and character entropy
(ops/textstats.char_entropy)."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-lm-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_ngram_counts(spark):
    from hickoryspark.ops.lm import ngram_counts

    df = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b"), (2, "x")],
        "doc_id long, text string")
    got = {r["ngram"]: r["cnt"] for r in ngram_counts(df, 2).collect()}
    assert got == {"a b": 3, "b a": 1, "b c": 1}
    # n=3: doc 1 and 2 too short, contribute nothing
    got3 = {r["ngram"]: r["cnt"] for r in ngram_counts(df, 3).collect()}
    assert got3 == {"a b a": 1, "b a b": 1, "a b c": 1}
    with pytest.raises(ValueError):
        ngram_counts(df, 0)


def test_continuation_counts(spark):
    from hickoryspark.ops.lm import continuation_counts

    # suffix 'c' follows {b, x}; suffix 'b' follows {a}
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "x c"), (2, "a b")],
        "doc_id long, text string")
    got = {r["suffix"]: r["n_contexts"]
           for r in continuation_counts(df, 2).collect()}
    assert got == {"b": 1, "c": 2}
    # trigram: suffix = 2 tokens
    got3 = {r["suffix"]: r["n_contexts"]
            for r in continuation_counts(df, 3).collect()}
    assert got3 == {"b c": 1}
    with pytest.raises(ValueError):
        continuation_counts(df, 1)


def test_char_entropy(spark):
    from hickoryspark.ops.textstats import char_entropy

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "ab"), (2, ""), (3, "aabb")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chars"], r["n_distinct"], r["entropy"])
           for r in char_entropy(df).collect()}
    assert got[0] == (4, 1, 0.0)
    assert got[1] == (2, 2, round(math.log(2), 6))
    assert got[2] == (0, 0, None)
    assert got[3] == (4, 2, round(math.log(2), 6))


def test_char_entropy_multibyte(spark):
    from hickoryspark.ops.textstats import char_entropy

    df = spark.createDataFrame([(0, "ééa")], "doc_id long, text string")
    r = char_entropy(df).collect()[0]
    want = round(math.log(3) - (2 * math.log(2)) / 3, 6)
    assert (r["n_chars"], r["n_distinct"], r["entropy"]) == (3, 2, want)
