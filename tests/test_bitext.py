"""Bitext candidate mining (ops/bitext.py)."""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-bitext-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _core(spark, alts, pages):
    from hickoryspark.ops.bitext import bitext_pairs_from_alts

    a = spark.createDataFrame(
        alts, "url string, alt_pos long, lang string, target string")
    p = spark.createDataFrame(pages, "url string, text string")
    return sorted(tuple(r) for r in
                  bitext_pairs_from_alts(a, p).collect())


def _mirror(alts, pages):
    from hickoryspark.ops.bitext import duckdb_bitext_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE alts(url VARCHAR, alt_pos BIGINT,"
                " lang VARCHAR, target VARCHAR)")
    con.execute("CREATE TABLE pages(url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO alts VALUES (?,?,?,?)", alts)
    if pages:
        con.executemany("INSERT INTO pages VALUES (?,?)", pages)
    rows = con.execute(duckdb_bitext_sql("alts", "pages")).fetchall()
    con.close()
    return sorted(tuple(r) for r in rows)


def test_basic_pair_features(spark):
    ta = "price 100 over 250 in 2024"
    tb = "Preis 100 ueber 250 im 2024"
    got = _core(
        spark,
        [("L", 1, "en", "A"), ("L", 2, "de", "B")],
        [("A", ta), ("B", tb)],
    )
    # nums identical -> jaccard 1000; ratio = exact integer milli
    ratio = min(len(ta), len(tb)) * 1000 // max(len(ta), len(tb))
    assert got == [("B", "de", "A", "en", len(tb), len(ta),
                    ratio, 1000)]


def test_orientation_and_dedup_across_listing_pages(spark):
    # both cluster members list the full cluster; the pair appears
    # once, oriented lang_a < lang_b regardless of listing order
    alts = [
        ("A", 1, "fr", "A"), ("A", 2, "en", "B"),
        ("B", 1, "en", "B"), ("B", 2, "fr", "A"),
    ]
    pages = [("A", "un 7"), ("B", "one 7")]
    got = _core(spark, alts, pages)
    assert [(r[0], r[1], r[2], r[3]) for r in got] == [
        ("B", "en", "A", "fr")]
    assert got == _mirror(alts, pages)


def test_same_lang_and_missing_page_dropped(spark):
    alts = [
        ("L", 1, "en", "A"), ("L", 2, "en", "A2"),  # same-lang pair
        ("L", 3, "de", "MISSING"),                  # unfetched
    ]
    pages = [("A", "x"), ("A2", "y")]
    assert _core(spark, alts, pages) == []


def test_empty_texts_and_no_numbers_pin_1000(spark):
    got = _core(
        spark,
        [("L", 1, "en", "A"), ("L", 2, "de", "B")],
        [("A", ""), ("B", "")],
    )
    assert got == [("B", "de", "A", "en", 0, 0, 1000, 1000)]


def test_number_tokens_stringwise(spark):
    # '007' and '7' are DISTINCT tokens (as written)
    ta, tb = "agent 007 x", "agent 7 xx"
    got = _core(
        spark,
        [("L", 1, "en", "A"), ("L", 2, "de", "B")],
        [("A", ta), ("B", tb)],
    )
    assert got[0][7] == 0  # jaccard: {007} vs {7} disjoint
    assert got[0][6] == min(len(ta), len(tb)) * 1000 // max(
        len(ta), len(tb))


def test_fuzz_vs_duckdb_mirror(spark):
    rng = random.Random(42)
    langs = ["en", "de", "fr", "es"]
    words = ["a", "bb", "ccc", "10", "250", "007", "9", "x1"]
    for _ in range(5):
        alts, pages, urls = [], [], []
        for li in range(rng.randint(1, 4)):
            url = f"L{li}"
            k = rng.randint(1, 4)
            picks = rng.sample(langs, k)
            for pos, lg in enumerate(picks, 1):
                tgt = f"P{rng.randint(0, 5)}"
                alts.append((url, pos, lg, tgt))
                urls.append(tgt)
        for u in set(urls):
            if rng.random() < 0.8:
                n = rng.randint(0, 8)
                pages.append(
                    (u, " ".join(rng.choice(words) for _ in range(n))))
        assert _core(spark, alts, pages) == _mirror(alts, pages)


def test_end_to_end_from_nodes(spark):
    from hickoryspark.ops.bitext import bitext_candidates
    from hickoryspark.spark.nodes_table import explode_nodes

    docs = spark.createDataFrame(
        [("https://s.ex/en",
          '<link rel=alternate hreflang=EN href="/en">'
          '<link rel=alternate hreflang=de href="https://s.ex:443/de">'
          "<p>one 7</p>")],
        "url string, html string")
    pages = spark.createDataFrame(
        [("https://s.ex/en", "one 7"), ("https://s.ex/de", "ein 7")],
        "url string, text string")
    got = [tuple(r) for r in
           bitext_candidates(explode_nodes(docs), pages).collect()]
    # hreflang lowercased, :443 folded by normalize_url
    assert got == [("https://s.ex/de", "de", "https://s.ex/en", "en",
                    5, 5, 1000, 1000)]


def test_alt_cap_bounds_hostile_listing(spark):
    from hickoryspark.ops.bitext import bitext_pairs_from_alts

    alts = [("L", i, "en" if i % 2 else "de", f"P{i}")
            for i in range(1, 40)]
    pages = [(f"P{i}", f"t {i}") for i in range(1, 40)]
    a = spark.createDataFrame(
        alts, "url string, alt_pos long, lang string, target string")
    p = spark.createDataFrame(pages, "url string, text string")
    capped = bitext_pairs_from_alts(a, p, alt_cap=4).collect()
    full = bitext_pairs_from_alts(a, p, alt_cap=None).collect()
    # cap=4 keeps alternates 1..4 -> 2x2 cross-lang pairs
    assert len(capped) == 4
    assert len(full) == 19 * 20  # 19 de x 20 en
