"""TextRank (ops/textrank.py): overlap graph, teleport-only
isolates, central-sentence dominance, sentence cap, mirror
agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.textrank import duckdb_textrank_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-trank-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, texts, **kw):
    from hickoryspark.ops.textrank import textrank_sentences

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    return {(r["doc_id"], r["sent_pos"]): r["rank_e9"]
            for r in textrank_sentences(df, **kw).collect()}


def test_central_sentence_wins(spark):
    # s2 shares tokens with s1 AND s3; s1/s3 don't touch each other;
    # s4 is isolated -> teleport only
    text = ("alpha beta one. beta gamma two. gamma delta three. "
            "omega isolated four.")
    got = _run(spark, [text], rounds=3)
    ranks = {p: got[(0, p)] for p in (1, 2, 3, 4)}
    assert ranks[2] == max(ranks.values())
    # isolated sentence = tele only: (1e9*15//100) div 4
    assert ranks[4] == 150000000 // 4
    assert ranks[1] == ranks[3]  # symmetric neighbors


def test_sentence_cap(spark):
    text = " ".join(f"tok{i} common." for i in range(10))
    got = _run(spark, [text], rounds=1, max_sentences=4)
    assert {p for (_, p) in got} == {1, 2, 3, 4}


def test_no_boundaries_single_sentence(spark):
    got = _run(spark, ["just words no punctuation"], rounds=2)
    # single sentence: no pairs, tele only with ns=1
    assert got == {(0, 1): 150000000}


def test_mirror_agreement(spark):
    texts = [
        "alpha beta one. beta gamma two. gamma delta three. end",
        "x y. y z! z x? solo",
        "no punctuation single",
        "",
    ]
    got = _run(spark, texts, rounds=3)
    con = duckdb.connect()
    con.execute("CREATE TABLE src (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)",
                    list(enumerate(texts)))
    want = {(r[0], r[1]): r[2] for r in con.execute(
        duckdb_textrank_sql("src", rounds=3)).fetchall()}
    assert got == want
