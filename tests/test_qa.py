"""FAQ / Q&A pair mining (ops/qa.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-qa-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _pairs(spark, html):
    from hickoryspark.ops.qa import faq_pairs
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return sorted(tuple(r)[1:] for r in
                  faq_pairs(explode_nodes(pages)).collect())


def test_basic_pair_bounded_by_next_heading(spark):
    got = _pairs(
        spark,
        "<h2>What is X?</h2><p>Ans.</p><h2>Other</h2><p>tail</p>")
    # 'Other' is not a question (no row) but bounds the first answer
    assert got == [(1, "h2", "What is X?", "Ans.")]


def test_non_question_headings_yield_nothing(spark):
    assert _pairs(spark, "<h3>No question here</h3><p>na</p>") == []


def test_nested_markup_question_and_loose_answer_text(spark):
    got = _pairs(spark, "<h1>Q<b>7</b>?</h1>ans head<p>mid</p>tail")
    assert got == [(1, "h1", "Q7?", "ans headmidtail")]


def test_adjacent_questions_empty_answer_and_numbering(spark):
    got = _pairs(
        spark, "<h2>A?</h2><h2>B?</h2><p>only b answer</p>")
    assert got == [(1, "h2", "A?", ""),
                   (2, "h2", "B?", "only b answer")]


def test_trim_and_whitespace_only_question_skipped(spark):
    got = _pairs(spark, "<h2>  Spaced?\t</h2><p>  a  </p><h2> \n </h2>")
    assert got == [(1, "h2", "Spaced?", "a")]


def test_question_mark_inside_but_not_terminal_skipped(spark):
    assert _pairs(spark, "<h2>Is it? Yes</h2><p>x</p>") == []


def test_answer_spans_multiple_blocks_until_end(spark):
    got = _pairs(
        spark, "<h4>Why?</h4><p>one</p><div>two <em>three</em></div>")
    assert got == [(1, "h4", "Why?", "onetwo three")]
