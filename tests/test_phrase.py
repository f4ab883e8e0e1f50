"""Positional phrase search (ops/retrieval.phrase_match): overlap
counting, repeated-term phrases, boundary starts, DuckDB mirror."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-phrase-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, docs, phrases):
    from hickoryspark.ops.retrieval import phrase_match

    d = spark.createDataFrame(docs, "doc_id long, text string")
    p = spark.createDataFrame(phrases, "phrase_id long, phrase string")
    return {
        (r["doc_id"], r["phrase_id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_match(d, p).collect()
    }


def test_basic_match_and_position(spark):
    out = _run(spark, [(1, "a b c a b")], [(0, "a b")])
    assert out == {(1, 0): (2, 0)}


def test_three_term_phrase(spark):
    out = _run(spark, [(1, "x a b c y a b")], [(0, "a b c")])
    assert out == {(1, 0): (1, 1)}


def test_overlapping_occurrences_each_count(spark):
    out = _run(spark, [(1, "x x x")], [(0, "x x")])
    assert out == {(1, 0): (2, 0)}


def test_repeated_term_phrase_no_false_positive(spark):
    # 'a a' must NOT match 'a b a' anywhere
    out = _run(spark, [(1, "a b a"), (2, "c a a c")], [(0, "a a")])
    assert out == {(2, 0): (1, 1)}


def test_no_match_absent_term(spark):
    out = _run(spark, [(1, "a b c")], [(0, "a zzz")])
    assert out == {}


def test_partial_prefix_is_not_a_match(spark):
    out = _run(spark, [(1, "a b")], [(0, "a b c")])
    assert out == {}


def test_whitespace_tokenization_and_empty_phrase(spark):
    out = _run(
        spark, [(1, "a\tb\nc")],
        [(0, "  a   b "), (1, "   "), (2, "c")],
    )
    assert out == {(1, 0): (1, 0), (1, 2): (1, 2)}


def test_mirror_agrees_on_random_texts(spark):
    import random

    import duckdb

    from hickoryspark.ops.retrieval import duckdb_phrase_sql

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30))))
        for i in range(40)
    ]
    phrases = [(0, "a b"), (1, "b b"), (2, "c"), (3, "a b a"),
               (4, "zz"), (5, "d d d")]
    got = _run(spark, docs, phrases)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    vals = ", ".join(f"({i}, '{p}')" for i, p in phrases)
    want = {
        (d, p): (n, f)
        for d, p, n, f in con.execute(
            duckdb_phrase_sql("documents", vals)).fetchall()
    }
    assert got == want


def test_snippets_window_and_clamping(spark):
    from hickoryspark.ops.retrieval import phrase_snippets

    docs = spark.createDataFrame(
        [(1, "a b c X Y d e f"), (2, "X Y tail1 tail2"),
         (3, "lead X Y")],
        "doc_id long, text string")
    phrases = spark.createDataFrame(
        [(0, "X Y")], "phrase_id long, phrase string")
    out = {r["doc_id"]: (r["first_pos"], r["snippet"])
           for r in phrase_snippets(docs, phrases, window=2).collect()}
    assert out[1] == (3, "b c X Y d e")
    assert out[2] == (0, "X Y tail1 tail2")   # left clamp
    assert out[3] == (1, "lead X Y")          # right clamp


def test_snippets_mirror_agrees(spark):
    import random

    import duckdb

    from hickoryspark.ops.retrieval import (duckdb_snippets_sql,
                                            phrase_snippets)

    rng = random.Random(13)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 25))))
        for i in range(30)
    ]
    phrases = [(0, "a b"), (1, "c"), (2, "d d")]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    p = spark.createDataFrame(phrases, "phrase_id long, phrase string")
    got = {(r["doc_id"], r["phrase_id"]): (r["first_pos"], r["snippet"])
           for r in phrase_snippets(d, p, window=2).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    vals = ", ".join(f"({i}, '{ph}')" for i, ph in phrases)
    want = {(dd, pp): (fp, sn) for dd, pp, fp, sn in con.execute(
        duckdb_snippets_sql("documents", vals, window=2)).fetchall()}
    assert got == want
