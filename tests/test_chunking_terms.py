"""Token chunking (ops/chunking.py) and corpus term stats
(ops/terms.py): window math, overlap coverage, tf-idf ranking,
surprisal weighting."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-chunk-terms-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _chunks(spark, text, max_tokens, overlap):
    from hickoryspark.ops.chunking import chunk_tokens

    rows = chunk_tokens(_docs(spark, [text]), max_tokens, overlap).collect()
    return sorted(rows, key=lambda r: r["chunk_id"])


def test_short_doc_single_chunk(spark):
    rows = _chunks(spark, "a b c", 8, 2)
    assert len(rows) == 1
    r = rows[0]
    assert (r["chunk_id"], r["n_chunks"], r["chunk_text"],
            r["n_chunk_tokens"]) == (0, 1, "a b c", 3)


def test_overlap_windows_cover_all_tokens(spark):
    toks = [f"t{i}" for i in range(10)]
    rows = _chunks(spark, " ".join(toks), 8, 4)  # stride 4
    # ceil((10-4)/4) = 2 chunks: [0:8], [4:10]
    assert [r["chunk_text"].split() for r in rows] == [
        toks[0:8], toks[4:10]]
    assert [r["n_chunk_tokens"] for r in rows] == [8, 6]
    assert all(r["n_chunks"] == 2 for r in rows)


def test_exact_multiple_no_empty_tail(spark):
    toks = [f"t{i}" for i in range(12)]
    rows = _chunks(spark, " ".join(toks), 8, 4)
    # ceil((12-4)/4) = 2: [0:8], [4:12] — no degenerate third window
    assert [r["n_chunk_tokens"] for r in rows] == [8, 8]


def test_whitespace_normalization_and_empty_doc(spark):
    rows = _chunks(spark, "  a\t\tb \n c  ", 8, 2)
    assert rows[0]["chunk_text"] == "a b c"
    assert _chunks(spark, " \t ", 8, 2) == []


def test_overlap_validation(spark):
    from hickoryspark.ops.chunking import chunk_tokens

    with pytest.raises(ValueError):
        chunk_tokens(_docs(spark, ["x"]), 8, 8)


def test_tfidf_ranking_and_tie_break(spark):
    from hickoryspark.ops.terms import tfidf_top_terms

    docs = _docs(spark, [
        "apple apple banana shared",
        "cherry shared",
        "shared shared",
    ])
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d0 = sorted(by_doc[0], key=lambda r: r["rank"])
    # apple: tf=2 df=1 -> 2*(ln(4/2)+1); banana tf=1 df=1; shared tf=1 df=3
    assert [r["term"] for r in d0] == ["apple", "banana"]
    exp_apple = round(2 * (math.log(4 / 2) + 1), 6)
    assert d0[0]["score"] == pytest.approx(exp_apple, abs=1e-9)
    assert d0[0]["tf"] == 2 and d0[0]["rank"] == 1
    # doc 2 has one distinct term -> one row even with k=2
    assert len(by_doc[2]) == 1


def test_tfidf_tie_breaks_lexicographically(spark):
    from hickoryspark.ops.terms import tfidf_top_terms

    docs = _docs(spark, ["zeta alpha", "other"])
    rows = sorted(
        (r for r in tfidf_top_terms(docs, k=1).collect()
         if r["doc_id"] == 0),
        key=lambda r: r["rank"],
    )
    # identical scores: alpha wins rank 1 by term order
    assert rows[0]["term"] == "alpha"


def test_unigram_surprisal_weighting(spark):
    from hickoryspark.ops.terms import unigram_surprisal

    docs = _docs(spark, ["x x x y", "x x x x"])
    rows = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    # corpus: x=7, y=1, total=8
    sx, sy = math.log(8 / 7), math.log(8 / 1)
    assert rows[0]["n_tokens"] == 4
    assert rows[0]["avg_surprisal"] == pytest.approx(
        round((3 * sx + sy) / 4, 6), abs=1e-9)
    assert rows[1]["avg_surprisal"] == pytest.approx(round(sx, 6), abs=1e-9)


def test_zero_token_docs_absent(spark):
    from hickoryspark.ops.terms import tfidf_top_terms, unigram_surprisal

    docs = _docs(spark, ["a b", "   "])
    assert {r["doc_id"] for r in unigram_surprisal(docs).collect()} == {0}
    assert {r["doc_id"] for r in tfidf_top_terms(docs).collect()} == {0}
