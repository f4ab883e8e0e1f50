"""Bigram Dice collocations (ops/terms.bigram_dice)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-bigrams-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, docs, **kw):
    from hickoryspark.ops.terms import bigram_dice

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {(r["w1"], r["w2"]): (r["n_pair"], r["dice_milli"])
            for r in bigram_dice(df, **kw).collect()}


def test_dice_values_and_threshold(spark):
    out = _run(spark, [
        (1, "new york new york"),
        (2, "new york city"),
        (3, "lone"),
        (4, ""),
    ])
    # 'new york': n_pair=3, c(new)=3, c(york)=3 -> 6000//6 = 1000
    assert out[("new", "york")] == (3, 1000)
    # 'york new' once (within doc 1): below min_count=2
    assert ("york", "new") not in out
    # 'york city' once: below threshold
    assert ("york", "city") not in out


def test_min_count_one_and_cross_doc_counts(spark):
    out = _run(spark, [(1, "a b c"), (2, "b c d")], min_count=1)
    # c(a)=1 c(b)=2 c(c)=2 c(d)=1
    assert out[("a", "b")] == (1, 2000 // 3)
    assert out[("b", "c")] == (2, 4000 // 4)
    assert out[("c", "d")] == (1, 2000 // 3)


def test_no_cross_document_bigrams(spark):
    out = _run(spark, [(1, "x"), (2, "y")], min_count=1)
    assert out == {}


def test_mirror_agrees_on_random_corpus(spark):
    import random

    import duckdb

    from hickoryspark.ops.terms import duckdb_bigram_dice_sql

    rng = random.Random(17)
    vocab = ["a", "b", "c", "d", "e"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 20))))
        for i in range(50)
    ]
    got = _run(spark, docs)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    want = {(a, b): (n, m) for a, b, n, m in con.execute(
        duckdb_bigram_dice_sql("documents")).fetchall()}
    assert got == want
