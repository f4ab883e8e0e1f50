"""Gopher repetition signals (ops/repetition.py): line/ngram
duplication ppm ratios, pinned tie-breaks, empty-doc rows."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-repetition-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _signals(spark, texts, **kw):
    from hickoryspark.ops.repetition import repetition_signals

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in
            repetition_signals(docs, **kw).collect()}


def test_line_duplication(spark):
    # 4 non-empty lines, keys: a, a, b, c -> 1 dup occurrence of 4;
    # dup chars = both 'a' occurrences (2) of total 2+2+11+2=... keys
    # are trimmed: ' a ' -> 'a'
    t = "a\n a \nbbbbbbbbbbb\nc\n\n   \n"
    out = _signals(spark, [t])[0]
    assert out["n_lines"] == 4
    assert out["dup_line_ppm"] == 1_000_000 // 4
    # key chars: a(1)+a(1)+b*11+c(1) = 14; dup = 2
    assert out["dup_line_char_ppm"] == 2 * 1_000_000 // 14


def test_gram_top_and_dup(spark):
    # tokens: x y x y z ; bigrams: 'x y'(2) 'y x'(1) 'y z'(1)
    out = _signals(spark, ["x y x y z"])[0]
    assert out["n_grams"] == 4
    assert out["top_gram"] == "x y"
    # occurrence chars: 2*3 + 3 + 3 = 12; top = 6; dup = 6
    assert out["top_gram_ppm"] == 6 * 1_000_000 // 12
    assert out["dup_gram_ppm"] == 6 * 1_000_000 // 12


def test_top_gram_tie_lexicographic(spark):
    # 'b a'(1) 'a b'(2) 'b c'(1) 'c a'(1): clear top; now force a tie
    out = _signals(spark, ["b a b a"])[0]
    # bigrams: 'b a'(2), 'a b'(1) -> top 'b a'; then a true tie case:
    out2 = _signals(spark, ["a b c d a b c d"])[0]
    # 'a b'(2) 'b c'(2) 'c d'(2) 'd a'(1) -> tie on 2, smallest = 'a b'
    assert out["top_gram"] == "b a"
    assert out2["top_gram"] == "a b"


def test_empty_and_short_docs_emit_rows(spark):
    out = _signals(spark, ["", "   \n\t\n", "solo"])
    assert set(out) == {0, 1, 2}
    for d in (0, 1):
        assert out[d]["n_lines"] == 0 and out[d]["n_grams"] == 0
        assert out[d]["top_gram"] is None
        assert out[d]["dup_line_ppm"] == 0 and out[d]["dup_gram_ppm"] == 0
    # one token, bigram window empty (the sequence(1,0) guard)
    assert out[2]["n_lines"] == 1 and out[2]["n_grams"] == 0


def test_whitespace_split_is_ascii_class(spark):
    # \x0b and \f are separators; NBSP is NOT (Java \s semantics)
    out = _signals(spark, ["a\x0bb\fa\x0bb", "x y x y"])
    assert out[0]["n_grams"] == 3 and out[0]["top_gram"] == "a b"
    # NBSP keeps 'x\xa0y' as ONE token -> bigram is the pair of them
    assert out[1]["top_gram"] == "x y x y"


def test_unigram_mode(spark):
    out = _signals(spark, ["a b a"], ngram_n=1)[0]
    assert out["n_grams"] == 3
    assert out["top_gram"] == "a"
    # chars: a+b+a = 3, top 'a' covers 2, dup 'a' covers 2
    assert out["top_gram_ppm"] == 2 * 1_000_000 // 3


def test_rejects_bad_n(spark):
    from hickoryspark.ops.repetition import repetition_signals

    with pytest.raises(ValueError):
        repetition_signals(spark.range(1), ngram_n=0)


def test_matches_duckdb_mirror(spark):
    # the oracle-side SQL pipeline over a mixed corpus must agree
    # row-for-row (same shape the gate query uses)
    import duckdb

    texts = [
        "the cat sat\nthe cat sat\nfin",
        "a b a b a b",
        "",
        "one two three four one two",
    ]
    got = _signals(spark, texts)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    from hickoryspark.ops.repetition import DUCKDB_REPETITION_SQL

    sql = "WITH " + DUCKDB_REPETITION_SQL.format(n=2, src="documents")
    for row in con.sql(sql).fetchall():
        d = dict(zip(["doc_id", "n_lines", "dup_line_ppm",
                      "dup_line_char_ppm", "n_grams", "top_gram",
                      "top_gram_ppm", "dup_gram_ppm"], row))
        assert got[d["doc_id"]] == d, d["doc_id"]
