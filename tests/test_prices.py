"""Price mention extraction (ops/prices.py) + mirror cross-check."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-prices-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


CASES = [
    (0, "it costs $5", [("USD", 500, "$5")]),
    (1, "sale: €1,234.50 today", [("EUR", 123450, "€1,234.50")]),
    (2, "GBP 99.9 or USD 7", [("GBP", 9990, "GBP 99.9"),
                              ("USD", 700, "USD 7")]),
    (3, "£ 12.05", [("GBP", 1205, "£ 12.05")]),
    (4, "no prices here", []),
    (5, None, []),
    (6, "$0.99 then $1500", [("USD", 99, "$0.99"),
                             ("USD", 150000, "$1500")]),
    (7, "weird $1234,567", [("USD", 123456700, "$1234,567")]),
]


def _run_spark(spark):
    from hickoryspark.ops.prices import extract_prices

    df = spark.createDataFrame([(i, t) for i, t, _ in CASES],
                               "doc_id long, text string")
    rows = extract_prices(df).collect()
    out: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["price_pos"])):
        out.setdefault(r["doc_id"], []).append(
            (r["currency"], r["amount_minor"], r["raw"]))
    return out


def test_prices_cases(spark):
    got = _run_spark(spark)
    for i, _, want in CASES:
        assert got.get(i, []) == want, (i, got.get(i, []), want)


def test_prices_mirror(spark):
    from hickoryspark.ops.prices import duckdb_prices_sql

    got = _run_spark(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)",
                    [(i, t) for i, t, _ in CASES])
    mir: dict[int, list] = {}
    for doc_id, pos, cur, minor, raw in con.execute(
            duckdb_prices_sql("d") + " ORDER BY doc_id, price_pos"
    ).fetchall():
        mir.setdefault(doc_id, []).append((cur, minor, raw))
    assert got == mir
