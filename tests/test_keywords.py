"""Per-doc TF-IDF keyword extraction (ops/keywords.py)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-keywords-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, rows, **kw):
    from hickoryspark.ops.keywords import doc_keywords

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(tuple(r) for r in doc_keywords(docs, **kw).collect())


CORPUS = [(1, "a b a"), (2, "a c"), (3, "")]


def test_scores_ranks_and_ties(spark):
    # n=3; df: a=2 b=1 c=1; idf_milli: a=1500 b=3000 c=3000
    got = _run(spark, CORPUS, top_k=5)
    assert got == [
        (1, 1, "a", 2, 2, 3000),   # tie with b broken by term asc
        (1, 2, "b", 1, 1, 3000),
        (2, 1, "c", 1, 1, 3000),
        (2, 2, "a", 1, 2, 1500),
    ]


def test_top_k_cut(spark):
    got = _run(spark, CORPUS, top_k=1)
    assert got == [(1, 1, "a", 2, 2, 3000), (2, 1, "c", 1, 1, 3000)]


def test_max_df_drops_ubiquitous_terms(spark):
    # a: df*1000 = 2000 >= 600*3 -> dropped; b, c kept
    got = _run(spark, CORPUS, top_k=5, max_df_milli=600)
    assert got == [(1, 1, "b", 1, 1, 3000), (2, 1, "c", 1, 1, 3000)]


def test_zero_token_doc_counts_toward_n_but_emits_nothing(spark):
    got = _run(spark, [(1, "x"), (2, "  \t ")], top_k=3)
    # n_docs=2 (the blank doc counts), so idf_milli = 2000
    assert got == [(1, 1, "x", 1, 1, 2000)]


def test_duckdb_mirror_agrees(spark):
    from hickoryspark.ops.keywords import duckdb_keywords_sql

    rows = []
    # deterministic pseudo-random corpus, repeated + rare terms
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    for i in range(40):
        words = [vocab[(i * 7 + j * 3) % len(vocab)]
                 for j in range((i % 6) + 1)]
        if i % 4 == 0:
            words.append(f"rare{i}")
        rows.append((i, " ".join(words)))
    for kw in ({"top_k": 3}, {"top_k": 2, "max_df_milli": 900}):
        got = _run(spark, rows, **kw)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, '{t}')" for i, t in rows)
            + ") t(doc_id, text)")
        want = sorted(tuple(r) for r in con.execute(
            duckdb_keywords_sql("d", **kw)).fetchall())
        assert got == want, kw
