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


# ---------------------------------------------------------------------------
# co-citation


def test_cocitation_counts_and_rules(spark):
    from hickoryspark.ops.identifiers import (
        cocitation_pairs, extract_identifiers)

    docs = spark.createDataFrame(
        [
            (0, "doi:10.1111/aa. doi:10.1111/bb. doi:10.1111/aa."),  # repeat = once
            (1, "doi:10.1111/aa. doi:10.1111/bb."),
            (2, "doi:10.1111/aa. doi:10.1111/cc."),
            (3, "see ISBN 978-0-306-40615-8 and doi:10.1111/aa."),  # bad isbn
        ],
        "doc_id long, text string",
    )
    ids = extract_identifiers(docs)
    out = {(r["id_a"], r["id_b"]): r["n_docs"]
           for r in cocitation_pairs(ids, min_count=1).collect()}
    assert out[("10.1111/aa", "10.1111/bb")] == 2
    assert out[("10.1111/aa", "10.1111/cc")] == 1
    # invalid-checksum ISBN contributes no pair with the doi
    assert all("978" not in a and "978" not in b for a, b in out)
    # min_count filter
    out2 = cocitation_pairs(ids, min_count=2).collect()
    assert [(r["id_a"], r["id_b"]) for r in out2] == [("10.1111/aa", "10.1111/bb")]


def test_cocitation_per_doc_cap_bounds_fanout(spark):
    from hickoryspark.ops.identifiers import cocitation_pairs

    ids = spark.createDataFrame(
        [(0, "doi", f"10.9/x{i:03d}", 1) for i in range(10)],
        "doc_id long, kind string, value string, valid long",
    )
    out = cocitation_pairs(ids, min_count=1, per_doc_cap=4).collect()
    # only the first 4 by value pair up: C(4,2) = 6
    assert len(out) == 6
