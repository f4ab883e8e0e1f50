"""Snapshot diffing (ops/snapshots.py) and readability scoring
(ops/textstats.py readability)."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-snapshots-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_crawl_delta_statuses(spark):
    from hickoryspark.ops.snapshots import crawl_delta

    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "gone")],
        "url string, payload string",
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "fresh")],
        "url string, payload string",
    )
    rows = {r["url"]: r for r in crawl_delta(old, new).collect()}
    assert rows["u1"]["status"] == "unchanged"
    assert rows["u2"]["status"] == "changed"
    assert rows["u3"]["status"] == "removed"
    assert rows["u4"]["status"] == "added"
    assert rows["u3"]["new_hash"] is None
    assert rows["u4"]["old_hash"] is None
    assert rows["u1"]["old_hash"] == rows["u1"]["new_hash"] == hashlib.md5(
        b"same"
    ).hexdigest()


def test_crawl_delta_shuffles_digests_not_payloads(spark):
    """hash-early projection: the exchanges must carry (url, md5)
    only — no payload column above a shuffle."""
    from hickoryspark.ops.snapshots import crawl_delta

    old = spark.createDataFrame([("u", "x" * 100)],
                                "url string, payload string")
    new = spark.createDataFrame([("u", "y" * 100)],
                                "url string, payload string")
    df = crawl_delta(old, new)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    for frag in plan.split("Exchange")[1:]:
        head = frag.split("\n", 1)[0]
        assert "payload" not in head, plan


def test_readability_pinned_arithmetic(spark):
    from hickoryspark.ops.textstats import readability

    docs = spark.createDataFrame(
        [(1, "the cat sat. it sat! why?"), (2, "zzz pfft"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability(docs).collect()}
    r = rows[1]
    # sentences: '.', '!', '?' -> 3; words: 6; vowel runs:
    # e,a,a,i,a,y -> 6
    assert (r["n_sentences"], r["n_words"], r["n_syllables"]) == (3, 6, 6)
    assert r["flesch_milli"] == 206835 - (1015 * 6) // 3 - (84600 * 6) // 6
    # no vowels / no sentence marks clamp to 1, never divide by zero
    assert (rows[2]["n_sentences"], rows[2]["n_syllables"]) == (1, 1)
    assert rows[3]["n_words"] == 1  # split('') yields one empty token


def test_build_corpus_composition(spark):
    """extract → score → threshold → dedup keep-min-url, end to end
    on literal pages (scores hand-checked: 10 distinct types of 12
    tokens vs all-stopword filler)."""
    from hickoryspark.ops.corpus import build_corpus

    body = ("<div id='main'><p>alpha beta gamma delta epsilon zeta "
            "eta theta iota the the the</p></div>")
    junk = "<div id='main'><p>" + "the " * 39 + "the</p></div>"
    pages = spark.createDataFrame(
        [("u2", body), ("u1", body), ("u3", junk)],
        "url string, html string",
    )
    rows = build_corpus(pages, min_quality_ppm=500000).collect()
    # junk: 1 distinct of 40 tokens -> 500000//40 + floor(40*300000/64)
    #       + 200000 = 12500 + 187500 + 200000 = 400000 -> filtered
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "u1"  # min url wins the dup group
    assert r["n_dups"] == 2
    assert r["quality_ppm"] == (10 * 500000) // 12 + (12 * 300000) // 64 + (
        3 * 200000
    ) // 12


def test_crawl_delta_null_payloads_track_presence(spark):
    from hickoryspark.ops.snapshots import crawl_delta

    old = spark.createDataFrame(
        [("u1", None), ("u2", None)], "url string, payload string"
    )
    new = spark.createDataFrame(
        [("u1", "body"), ("u2", None)], "url string, payload string"
    )
    rows = {r["url"]: r for r in crawl_delta(old, new).collect()}
    # a failed fetch is still presence: never 'added'/'removed'
    assert rows["u1"]["status"] == "changed"
    assert rows["u2"]["status"] == "unchanged"
    assert rows["u1"]["old_hash"] is None
