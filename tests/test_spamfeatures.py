"""Ntoulas content-spam features (ops/spamfeatures.py): hand-derived
features on a tiny corpus, top-k tie rule, empty/NULL docs, mirror
agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.spamfeatures import (  # noqa: E402
    duckdb_spam_features_sql,
)

# corpus counts: aa x4, bb x3, cc x2, dd x1 -> top_k=2 = {aa, bb}
DOCS = [
    (1, "t one", "aa aa bb cc"),
    (2, None, "aa bb cc dd"),
    (3, "three word title", "aa bb"),
    (4, "t", ""),          # empty text
    (5, "x", None),        # NULL text
]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-spam-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, top_k=2):
    from hickoryspark.ops.spamfeatures import spam_features

    docs = spark.createDataFrame(
        DOCS, "doc_id long, title string, text string")
    return sorted(tuple(r)
                  for r in spam_features(docs, top_k=top_k).collect())


def test_features(spark):
    got = {r[0]: r[1:] for r in _run(spark)}
    # (n_words, avg_word_len_milli, title_words, frac_top_milli,
    #  top_coverage_milli)
    assert got[1] == (4, 2000, 2, 750, 1000)   # aa aa bb of 4
    assert got[2] == (4, 2000, 0, 500, 1000)   # NULL title -> 0
    assert got[3] == (2, 2000, 3, 1000, 1000)
    assert got[4] == (0, 0, 1, 0, 0)
    assert got[5] == (0, 0, 1, 0, 0)


def test_mirror_agreement(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, title VARCHAR,"
                " text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", DOCS)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_spam_features_sql("d", top_k=2)).fetchall())
    assert _run(spark) == want


def test_topk_tie_rule(spark):
    # cc and dd tie at count 2 with top_k=3: term ASC picks cc
    docs = [(1, "", "aa aa cc dd"), (2, "", "bb bb cc dd")]
    con = duckdb.connect()
    con.execute("CREATE TABLE d2 (doc_id BIGINT, title VARCHAR,"
                " text VARCHAR)")
    con.executemany("INSERT INTO d2 VALUES (?, ?, ?)", docs)
    from hickoryspark.ops.spamfeatures import spam_features

    sdf = spark.createDataFrame(
        docs, "doc_id long, title string, text string")
    got = sorted(tuple(r)
                 for r in spam_features(sdf, top_k=3).collect())
    want = sorted(tuple(r) for r in con.execute(
        duckdb_spam_features_sql("d2", top_k=3)).fetchall())
    assert got == want
    # top-3 = {aa(2), bb(2), cc(2)} by (cnt DESC, term ASC); dd out
    by_id = {r[0]: r for r in got}
    assert by_id[1][4] == 750   # aa aa cc of 4 occurrences
