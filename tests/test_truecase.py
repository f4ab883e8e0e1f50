"""Unigram truecasing (ops/truecase.py): model argmax + tie rule,
pass-through for unknown tokens, whitespace normalization, empty
docs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-truecase-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_model_and_apply(spark):
    from hickoryspark.ops.truecase import learn_case_model, truecase

    corpus = spark.createDataFrame(
        [(1, "The cat"), (2, "the The THE dog Dog")],
        "doc_id long, text string")
    model = {r["key"]: r["form"]
             for r in learn_case_model(corpus).collect()}
    # The:2 beats the:1/THE:1; dog/Dog tie -> lexicographically
    # greatest form ('dog' > 'Dog' in code-point order)
    assert model == {"the": "The", "cat": "cat", "dog": "dog"}

    mdl = learn_case_model(corpus)
    inp = spark.createDataFrame(
        [(10, "the  dog\tCAT x"), (11, "   "), (12, "THE THE")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["restored"]
           for r in truecase(inp, mdl).collect()}
    # unknown 'x' passes through; whitespace normalizes to single
    # spaces; whitespace-only doc restores to ''
    assert out == {10: "The dog cat x", 11: "", 12: "The The"}


def test_restores_all_tokens_not_just_cased(spark):
    from hickoryspark.ops.truecase import learn_case_model, truecase

    corpus = spark.createDataFrame(
        [(1, "iPhone iPhone IPHONE 42")], "doc_id long, text string")
    mdl = learn_case_model(corpus)
    inp = spark.createDataFrame(
        [(2, "iphone 42")], "doc_id long, text string")
    out = truecase(inp, mdl).collect()[0]["restored"]
    assert out == "iPhone 42"
