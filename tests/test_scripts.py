"""Script-profile tests (ops/scripts.py)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.scripts import (SCRIPT_CLASSES, duckdb_script_sql,
                                      script_profile)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-scripts-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


DOCS = [
    (0, "hello world"),                       # pure latin + space
    (1, "Привет мир"),                        # cyrillic
    (2, "日本語のテキストです"),                 # cjk + kana mix
    (3, "café número"),                       # latin incl. accents
    (4, "abc Привет 123"),                    # mixed + digits
    (5, ""),                                  # empty -> all 0
    (6, None),                                # NULL -> NULL ppms
    (7, "한국어 텍스트"),                       # hangul
    (8, "שלום עולם"),                         # hebrew
    (9, "مرحبا بالعالم"),                     # arabic
]


def test_profile_pinned_values(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}
    # doc 0: 10 latin letters of 11 chars
    assert got[0]["latin_ppm"] == 1000000 * 10 // 11
    assert got[0]["cyrillic_ppm"] == 0
    # doc 1: 9 cyrillic of 10
    assert got[1]["cyrillic_ppm"] == 1000000 * 9 // 10
    # doc 2: kana and cjk both nonzero (の/テキスト vs 日本語)
    assert got[2]["kana_ppm"] > 0 and got[2]["cjk_ppm"] > 0
    # accents count as latin
    assert got[3]["latin_ppm"] == 1000000 * 10 // 11
    assert got[4]["digit_ppm"] == 1000000 * 3 // 14
    assert got[5]["latin_ppm"] == 0 and got[5]["n_chars"] == 0
    assert got[6]["latin_ppm"] is None and got[6]["n_chars"] is None
    assert got[7]["hangul_ppm"] > 500000
    assert got[8]["hebrew_ppm"] > 500000
    assert got[9]["arabic_ppm"] > 500000


def test_duckdb_mirror_matches(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: tuple(r)[1:]
           for r in script_profile(df)
           .select("doc_id", "n_chars",
                   *[f"{n}_ppm" for n in SCRIPT_CLASSES]).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    rows = con.execute(
        f"SELECT doc_id, {duckdb_script_sql('text')} FROM d").fetchall()
    for row in rows:
        assert got[row[0]] == row[1:], row[0]


def test_python_reference_counts(spark):
    # independent per-codepoint reference of the class semantics
    import re

    ranges = {
        "latin": [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)],
        "cyrillic": [(0x400, 0x4FF)],
        "hangul": [(0x1100, 0x11FF), (0xAC00, 0xD7A3)],
    }
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}
    for doc_id, text in DOCS:
        if not text:
            continue
        for name, rs in ranges.items():
            cnt = sum(1 for ch in text
                      if any(a <= ord(ch) <= b for a, b in rs))
            assert got[doc_id][f"{name}_ppm"] == \
                1000000 * cnt // len(text), (doc_id, name)
