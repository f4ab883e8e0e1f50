"""RAKE (ops/rake.py): boundary rules, degree/frequency arithmetic,
phrase cap, tie ordering, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.rake import duckdb_rake_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-rake-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, texts, **kw):
    from hickoryspark.ops.rake import rake_keywords

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    return sorted(tuple(r) for r in rake_keywords(df, **kw).collect())


def test_classic_example(spark):
    # 'the' splits the runs: [deep learning beats] [shallow
    # learning] [truly]
    text = "deep learning beats the shallow learning , truly ."
    got = _run(spark, [text], k=3)
    by_phrase = {r[1]: r[2] for r in got}
    # freq: deep 1, learning 2, beats 1, shallow 1, truly 1
    # deg:  deep 3, learning 3+2=5, beats 3, shallow 2, truly 1
    assert by_phrase["deep learning beats"] == (
        3000 + 5000 // 2 + 3000)
    assert by_phrase["shallow learning"] == 2000 + 5000 // 2
    assert by_phrase["truly"] == 1000


def test_boundaries_and_cap(spark):
    # stopwords and punctuation-only tokens split runs; edge
    # punctuation strips ('learning,' -> 'learning'); runs longer
    # than max_len drop
    text = "the quick brown fox jumps over lazy dogs"
    got = _run(spark, [text], k=5, max_len=4)
    phrases = [r[1] for r in got]
    # 'quick brown fox jumps' (4 <= cap) kept, split by 'over'
    assert "quick brown fox jumps" in phrases
    assert "lazy dogs" in phrases
    got2 = _run(spark, [text], k=5, max_len=3)
    assert "quick brown fox jumps" not in [r[1] for r in got2]


def test_case_insensitive_stopwords(spark):
    got = _run(spark, ["The Cat AND dog"], k=5)
    assert [r[1] for r in got] == ["Cat", "dog"]


def test_mirror_agreement(spark):
    texts = [
        "deep learning beats shallow learning , truly .",
        "the quick brown fox jumps over lazy dogs",
        "rapid automatic keyword extraction of keyword candidates "
        "and extraction quality",
        "",
        "THE AND OF",    # all stopwords -> no rows
    ]
    got = _run(spark, texts, k=4)
    con = duckdb.connect()
    con.execute("CREATE TABLE src (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)",
                    list(enumerate(texts)))
    want = sorted(tuple(r) for r in
                  con.execute(duckdb_rake_sql("src", k=4)).fetchall())
    assert got == want
