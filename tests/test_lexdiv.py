"""Lexical diversity (textstats.lexical_diversity): hand-computed
TTR/hapax, empty docs, whitespace handling."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-lexdiv-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_lexical_diversity(spark):
    from hickoryspark.ops.textstats import lexical_diversity

    docs = spark.createDataFrame(
        [(1, "a b a c  a\tb"),     # 6 toks, 3 types (a:3 b:2 c:1)
         (2, "x"),                 # 1/1/1
         (3, ""),                  # empty
         (4, " \t ")],             # whitespace only
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["n_types"], r["n_hapax"],
                         r["ttr_milli"], r["hapax_milli"])
           for r in lexical_diversity(docs).collect()}
    assert out[1] == (6, 3, 1, 500, 333)
    assert out[2] == (1, 1, 1, 1000, 1000)
    assert out[3] == (0, 0, 0, 0, 0)
    assert out[4] == (0, 0, 0, 0, 0)
