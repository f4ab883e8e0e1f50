"""C4-style badword filtering (ops/wordfilter.py): token-level match,
occurrence counts, fold rules, zero-hit rows."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-wordfilter-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _hits(spark, texts, words):
    from hickoryspark.ops.wordfilter import badword_hits

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wl = spark.createDataFrame([(w,) for w in words], "word string")
    return {r["doc_id"]: r.asDict() for r in
            badword_hits(docs, wl).collect()}


def test_token_level_not_substring(spark):
    out = _hits(spark, ["the classic grass is green", "bad ASS bad"],
                ["ass", "bad"])
    # 'classic'/'grass' contain 'ass' but are NOT token matches
    assert out[0]["n_hits"] == 0 and out[0]["passes_wordfilter"]
    # occurrences counted, case-folded; first = lexicographic min
    assert out[1]["n_hits"] == 3
    assert out[1]["first_badword"] == "ass"
    assert not out[1]["passes_wordfilter"]


def test_word_list_fold_and_blank_entries(spark):
    out = _hits(spark, ["x spam y"], ["  SPAM\r", "", "   "])
    assert out[0]["n_hits"] == 1 and out[0]["first_badword"] == "spam"


def test_empty_and_null_docs_emit_passing_rows(spark):
    from hickoryspark.ops.wordfilter import badword_hits

    docs = spark.createDataFrame([(0, ""), (1, None)],
                                 "doc_id long, text string")
    wl = spark.createDataFrame([("bad",)], "word string")
    out = {r["doc_id"]: r.asDict() for r in
           badword_hits(docs, wl).collect()}
    for i in (0, 1):
        assert out[i]["n_hits"] == 0 and out[i]["passes_wordfilter"]
        assert out[i]["first_badword"] is None


def test_wordfilter_join_is_broadcast(spark):
    from hickoryspark.ops.wordfilter import badword_hits

    docs = spark.createDataFrame([(0, "a bad day")],
                                 "doc_id long, text string")
    wl = spark.createDataFrame([("bad",)], "word string")
    out = badword_hits(docs, wl)
    out.collect()
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple")
    assert "BroadcastHashJoin" in plan


def test_punctuation_adjacent_tokens_match(spark):
    # review fix: a sentence-final 'spam.' or 'spam,' must still hit;
    # pure-punctuation tokens never match; entries fold the same way
    out = _hits(spark, ["buy spam. cheap", "spam, eggs !!! ..."],
                ['"spam"'])
    assert out[0]["n_hits"] == 1 and out[0]["first_badword"] == "spam"
    assert out[1]["n_hits"] == 1
    # inner punctuation is NOT stripped: 's.o.b' stays distinct
    out2 = _hits(spark, ["a s.o.b here"], ["s.o.b"])
    assert out2[0]["n_hits"] == 1 and out2[0]["first_badword"] == "s.o.b"
