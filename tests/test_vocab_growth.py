"""Heaps-law vocab growth (ops/vocab.vocab_growth): ordinal
semantics, checkpoint counts, partition-shape invariance, mirror
agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.vocab import duckdb_vocab_growth_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-vg-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, texts, cps, n_parts=None):
    from hickoryspark.ops.vocab import vocab_growth

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    return sorted(
        (r["n_tokens_seen"], r["n_types"])
        for r in vocab_growth(df, cps, num_partitions=n_parts).collect())


def test_curve_semantics(spark):
    # doc order: doc0 = "a b a", doc1 = "b  c" (double space -> 2
    # tokens), doc2 = "d". Global: a(1) b(2) a(3) b(4) c(5) d(6).
    texts = ["a b a", "b  c", "d"]
    got = _run(spark, texts, (1, 2, 3, 5, 6, 100))
    assert got == [(1, 1), (2, 2), (3, 2), (5, 3), (6, 4), (100, 4)]


def test_partition_invariance(spark):
    texts = [f"w{i % 7} w{i % 13} common" for i in range(50)]
    a = _run(spark, texts, (10, 50, 150), n_parts=1)
    b = _run(spark, texts, (10, 50, 150), n_parts=7)
    assert a == b


def test_empty_corpus(spark):
    got = _run(spark, ["", "   "], (10,))
    assert got == [(10, 0)]


def test_mirror_agreement(spark):
    texts = [f"tok{(i * 3) % 11} x{i % 4} filler text {i % 2}"
             for i in range(40)]
    cps = (5, 40, 120, 10000)
    got = _run(spark, texts, cps)
    con = duckdb.connect()
    con.execute("CREATE TABLE src (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)",
                    list(enumerate(texts)))
    want = sorted(tuple(r) for r in con.execute(
        duckdb_vocab_growth_sql("src", cps)).fetchall())
    assert got == want
