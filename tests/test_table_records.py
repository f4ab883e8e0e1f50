"""Header-keyed table records (ops/tables.table_records)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-tablerecords-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _recs(spark, html):
    from hickoryspark.ops.tables import extract_tables, table_records

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    out = table_records(extract_tables(pages))
    return sorted((tuple(r) for r in out.collect()),
                  key=lambda t: (t[1], t[2], t[3]))


def test_simple_header_table(spark):
    rows = _recs(
        spark,
        "<table><tr><th>k1</th><th>k2</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>")
    assert rows == [
        ("u", 0, 1, 0, "k1", "a"),
        ("u", 0, 1, 1, "k2", "b"),
    ]


def test_colspan_header_covers_columns(spark):
    rows = _recs(
        spark,
        '<table><tr><th colspan=2>k</th><th>u</th></tr>'
        "<tr><td>x</td><td>y</td><td>z</td></tr></table>")
    assert rows == [
        ("u", 0, 1, 0, "k", "x"),
        ("u", 0, 1, 1, "k", "y"),
        ("u", 0, 1, 2, "u", "z"),
    ]


def test_data_first_table_yields_nothing(spark):
    assert _recs(spark, "<table><tr><td>n</td></tr></table>") == []


def test_mixed_row0_not_qualified(spark):
    assert _recs(
        spark,
        "<table><tr><th>h</th><td>d</td></tr>"
        "<tr><td>v</td><td>w</td></tr></table>") == []


def test_row_header_th_is_a_value(spark):
    rows = _recs(
        spark,
        "<table><tr><th>h</th></tr><tr><th>rh</th></tr></table>")
    assert rows == [("u", 0, 1, 0, "h", "rh")]


def test_data_wider_than_header_keeps_null_key(spark):
    rows = _recs(
        spark,
        "<table><tr><th>o</th></tr><tr><td>p</td><td>q</td></tr></table>")
    assert rows == [
        ("u", 0, 1, 0, "o", "p"),
        ("u", 0, 1, 1, None, "q"),
    ]


def test_second_table_indexed_independently(spark):
    rows = _recs(
        spark,
        "<table><tr><td>layout</td></tr></table>"
        "<table><tr><th>k</th></tr><tr><td>v</td></tr></table>")
    assert rows == [("u", 1, 1, 0, "k", "v")]
