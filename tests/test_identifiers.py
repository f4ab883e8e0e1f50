"""Scholarly identifiers (ops/identifiers.py): extraction classes,
DOI trailing-punctuation trim, arXiv case sensitivity, ISBN-13
checksum, and Spark-vs-DuckDB mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.identifiers import duckdb_identifiers_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-ids-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, texts):
    from hickoryspark.ops.identifiers import extract_identifiers

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    return sorted(
        (r["doc_id"], r["kind"], r["value"], r["valid"])
        for r in extract_identifiers(df).collect())


def test_extraction_classes(spark):
    rows = _run(spark, [
        "see doi:10.1234/abc.DEF-5;x. end",
        "cited as arXiv:2107.03374v2 and arxiv:9999.9999 (lowercase "
        "prefix must NOT match)",
        "ISBN 978-0-306-40615-7 valid; ISBN 978-0-306-40615-8 bad",
        "bare 9780306406157 also valid",
    ])
    assert rows == [
        (0, "doi", "10.1234/abc.DEF-5;x", 1),
        (1, "arxiv", "2107.03374v2", 1),
        (2, "isbn13", "9780306406157", 1),
        (2, "isbn13", "9780306406158", 0),
        (3, "isbn13", "9780306406157", 1),
    ]


def test_doi_trim_and_boundaries(spark):
    rows = _run(spark, [
        "(10.5555/12345678).",      # trailing ')' + '.' trimmed
        "10.123/too-few-prefix",    # 3-digit registrant: no match
        "x978030640615y7",          # \b fails inside a word
    ])
    assert rows == [(0, "doi", "10.5555/12345678", 1)]


def test_mirror_agreement(spark):
    texts = [
        "doi:10.1234/a.b(c):d, then arXiv:2401.12345 and "
        "978 0 306 40615 7.",
        "no ids here 123456789 97812345",
        "two dois 10.99999/x;y. and 10.1000/xyz123 plus "
        "ISBN 979-10-90636-07-1",
        "",
    ]
    got = _run(spark, texts)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(enumerate(texts)))
    want = sorted(tuple(r) for r in
                  con.execute(duckdb_identifiers_sql("t")).fetchall())
    assert got == want
