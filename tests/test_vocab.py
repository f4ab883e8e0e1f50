"""Corpus vocabulary statistics (ops/vocab.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-vocab-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _stats(spark, rows):
    from hickoryspark.ops.vocab import vocab_stats

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return [tuple(r) for r in vocab_stats(docs).collect()]


def test_counts_and_ratios(spark):
    # tokens: a a b | a c -> n_tokens=5, types={a,b,c}=3,
    # hapax: b,c (cf=1) -> 2; singleton-df: b,c -> 2
    got = _stats(spark, [(1, "a a b"), (2, "a c")])
    assert got == [(2, 5, 3, 2, 2, 600, 666)]


def test_empty_corpus_zeros(spark):
    got = _stats(spark, [(1, ""), (2, " \t ")])
    assert got == [(2, 0, 0, 0, 0, 0, 0)]


def test_duckdb_mirror_agrees(spark):
    from hickoryspark.ops.vocab import duckdb_vocab_sql

    rows = [(i, " ".join("w%d" % ((i * 3 + j) % 7)
                         for j in range(i % 5)))
            for i in range(25)]
    got = _stats(spark, rows)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join("(%d, '%s')" % r for r in rows)
        + ") t(doc_id, text)")
    want = [tuple(r) for r in
            con.execute(duckdb_vocab_sql("d")).fetchall()]
    assert got == want


def test_stopword_candidates_threshold_and_mirror(spark):
    from hickoryspark.ops.vocab import (duckdb_stopwords_sql,
                                        stopword_candidates)

    rows = [(1, "the cat sat"), (2, "the dog ran"), (3, "the cat")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 stopword_candidates(docs, min_df_milli=600).collect())
    # the: df=3 (1000 milli); cat: df=2 (666) -> both >= 600
    assert got == [("cat", 2, 2, 666), ("the", 3, 3, 1000)]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join("(%d, '%s')" % r for r in rows)
        + ") t(doc_id, text)")
    want = sorted(tuple(r) for r in con.execute(
        duckdb_stopwords_sql("d", min_df_milli=600)).fetchall())
    assert got == want
