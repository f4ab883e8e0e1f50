"""Sentence segmentation (ops/sentences.py): boundary rules, trim,
separator scrub, cross-engine mirror."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-sentences-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _sents(spark, texts):
    from hickoryspark.ops.sentences import split_sentences

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {}
    for r in split_sentences(docs).collect():
        out.setdefault(r["doc_id"], {})[r["sent_pos"]] = (
            r["sentence"], r["n_tokens"])
    return out


def test_boundaries_and_token_counts(spark):
    out = _sents(spark, ["One two. Three?!  Four five six! tail"])
    assert out[0] == {
        1: ("One two.", 2),
        2: ("Three?!", 1),
        3: ("Four five six!", 3),
        4: ("tail", 1),
    }


def test_punct_without_ws_is_not_a_boundary(spark):
    # 'e.g.x' has no ws after the dots -> one sentence; terminal
    # punctuation at end-of-text also stays (no trailing ws)
    out = _sents(spark, ["e.g.x stays whole.", "a.b. c"])
    assert out[0] == {1: ("e.g.x stays whole.", 3)}
    assert out[1] == {1: ("a.b.", 1), 2: ("c", 1)}


def test_empty_null_and_ws_only(spark):
    out = _sents(spark, ["", "   ", None, "!  ", "x"])
    assert 0 not in out and 1 not in out and 2 not in out
    assert out[3] == {1: ("!", 1)}
    assert out[4] == {1: ("x", 1)}


def test_separator_injection_is_scrubbed(spark):
    # hostile U+001F in the input must not create boundaries
    out = _sents(spark, ["a\x1fb. c"])
    assert out[0] == {1: ("ab.", 1), 2: ("c", 1)}


def test_matches_duckdb_mirror(spark):
    import duckdb

    from hickoryspark.ops.sentences import DUCKDB_SENTENCES_SQL

    texts = ["One two. Three?! tail", "", "a.b. c", "x\x1fy! z",
             "No boundary here", "Multi  ws.\t\nNext!"]
    got = _sents(spark, texts)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    want = {}
    for doc_id, pos, s, n in con.sql(
        "WITH " + DUCKDB_SENTENCES_SQL.format(src="documents")
    ).fetchall():
        want.setdefault(doc_id, {})[pos] = (s, n)
    assert got == want


def test_shuffle_free_plan(spark):
    from hickoryspark.ops.sentences import split_sentences

    docs = spark.createDataFrame([(0, "a. b")], "doc_id long, text string")
    plan = split_sentences(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# remove_frequent_sentences


def test_remove_frequent_sentences_rule(spark):
    from hickoryspark.ops.sentences import remove_frequent_sentences

    promo = "Buy our product now!"
    docs = spark.createDataFrame(
        [
            (0, f"Unique zero. {promo} Tail zero."),
            (1, f"Unique one. {promo} Tail one."),
            (2, f"{promo} Unique two."),
            (3, promo),          # fully boilerplate -> empty survivor
            (4, ""),             # empty doc keeps its row
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           remove_frequent_sentences(docs, min_count=3).collect()}
    assert out[0]["text"] == "Unique zero. Tail zero."
    assert (out[0]["n_kept"], out[0]["n_dropped"]) == (2, 1)
    assert out[2]["text"] == "Unique two."
    assert (out[3]["n_kept"], out[3]["n_dropped"], out[3]["text"]) == (
        0, 1, "")
    assert (out[4]["n_kept"], out[4]["n_dropped"], out[4]["text"]) == (
        0, 0, "")
    assert len(out) == 5


def test_remove_frequent_mirror_matches(spark):
    import duckdb

    from hickoryspark.ops.sentences import (
        duckdb_remove_frequent_sql, remove_frequent_sentences)

    rows = [(i, f"Alpha {i % 2}. Shared line here! End {i}.")
            for i in range(12)] + [(99, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 remove_frequent_sentences(df, min_count=3).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_remove_frequent_sql("d", 3)).fetchall())
    assert got == want
    # 'Alpha 0.'/'Alpha 1.' occur 6x each and 'Shared line here!' 12x
    # -> all dropped; only the unique tails survive
    assert all(t[3].startswith("End") or t[3] == "" for t in got)
