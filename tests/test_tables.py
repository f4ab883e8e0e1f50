"""HTML table extraction (ops/tables.py): grid placement per the HTML
table processing model — spans, rowspan=0, section ordering, nested
tables, spec clamps, and the hostile-span memory cap."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.html.core import as_hickory, parse
from hickoryspark.nodes import flatten
from hickoryspark.ops.tables import tables_doc


def _cells(html, **kw):
    return tables_doc(flatten(as_hickory(parse(html))), **kw)


def _grid(html, **kw):
    """(row_idx, col_idx) -> cell_text for the FIRST table."""
    return {
        (r, c): txt
        for ti, tp, r, c, rs, cs, hd, txt in _cells(html, **kw)
        if ti == 0
    }


def test_simple_grid_and_header_flag():
    rows = _cells(
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table>"
    )
    assert [(r, c, hd, txt) for _, _, r, c, _, _, hd, txt in rows] == [
        (0, 0, True, "h1"),
        (0, 1, True, "h2"),
        (1, 0, False, "a"),
        (1, 1, False, "b"),
    ]


def test_rowspan_pushes_later_rows_cells_right():
    # spec example: the spanning cell occupies (0,0)-(1,0); row 1's
    # first cell lands at col 1
    g = _grid(
        '<table><tr><td rowspan=2>x</td><td>a</td></tr>'
        "<tr><td>b</td></tr></table>"
    )
    assert g == {(0, 0): "x", (0, 1): "a", (1, 1): "b"}


def test_colspan_advances_cursor():
    g = _grid(
        '<table><tr><td colspan=2>wide</td><td>c</td></tr>'
        "<tr><td>a</td><td>b</td><td>d</td></tr></table>"
    )
    assert g == {
        (0, 0): "wide",
        (0, 2): "c",
        (1, 0): "a",
        (1, 1): "b",
        (1, 2): "d",
    }


def test_rowspan_zero_spans_to_last_row():
    rows = _cells(
        '<table><tr><td rowspan=0>x</td><td>a</td></tr>'
        "<tr><td>b</td></tr><tr><td>c</td></tr></table>"
    )
    x = next(r for r in rows if r[7] == "x")
    assert x[4] == 3  # effective rowspan = nrows - r
    g = {(r, c): t for _, _, r, c, _, _, _, t in rows}
    assert g[(1, 1)] == "b" and g[(2, 1)] == "c"


def test_combined_row_and_colspan_block():
    # 2x2 block at (0,0): both later rows and same-row cells skip it
    g = _grid(
        '<table><tr><td rowspan=2 colspan=2>blk</td><td>a</td></tr>'
        "<tr><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
    )
    assert g == {
        (0, 0): "blk",
        (0, 2): "a",
        (1, 2): "b",
        (2, 0): "c",
        (2, 1): "d",
    }


def test_section_order_thead_body_tfoot():
    # document order: tfoot before tbody is legal HTML; rendering
    # order (and our row_idx) is thead, body, tfoot
    rows = _cells(
        "<table><thead><tr><td>h</td></tr></thead>"
        "<tfoot><tr><td>f</td></tr></tfoot>"
        "<tbody><tr><td>b1</td></tr><tr><td>b2</td></tr></tbody></table>"
    )
    assert [(r[2], r[7]) for r in rows] == [
        (0, "h"),
        (1, "b1"),
        (2, "b2"),
        (3, "f"),
    ]


def test_nested_table_is_its_own_table_and_text_excluded():
    rows = _cells(
        "<table><tr><td>outer <table><tr><td>inner</td></tr></table>"
        " tail</td><td>b</td></tr></table>"
    )
    by_table = {}
    for ti, _, r, c, _, _, _, txt in rows:
        by_table.setdefault(ti, []).append((r, c, txt))
    # outer cell text excludes the nested table's text but keeps both
    # its own text pieces around it
    assert by_table[0] == [(0, 0, "outer tail"), (0, 1, "b")]
    assert by_table[1] == [(0, 0, "inner")]


def test_tables_indexed_in_document_order():
    rows = _cells(
        "<table><tr><td>t0</td></tr></table>"
        "<p>x</p><table><tr><td>t1</td></tr></table>"
    )
    assert [(r[0], r[7]) for r in rows] == [(0, "t0"), (1, "t1")]
    assert rows[0][1] < rows[1][1]  # table_pre is document order


def test_span_attribute_parsing_and_clamps():
    rows = _cells(
        '<table><tr><td colspan="  7abc">a</td>'
        '<td colspan="junk">b</td>'
        '<td colspan="5000">c</td>'
        '<td rowspan="99999">d</td></tr></table>'
    )
    spans = {txt: (rs, cs) for _, _, _, _, rs, cs, _, txt in rows}
    assert spans["a"][1] == 7  # leading-ws+digits prefix parses
    assert spans["b"][1] == 1  # invalid -> default
    assert spans["c"][1] == 1000  # colspan clamp
    assert spans["d"][0] == 1  # rowspan clamped to remaining rows


def test_comment_payload_not_in_cell_text():
    g = _grid("<table><tr><td>a<!--secret-->b</td></tr></table>")
    assert g == {(0, 0): "a b"}


def test_cell_text_whitespace_normalization():
    g = _grid("<table><tr><td>  a\n\n  <b> b2 </b>\t</td></tr></table>")
    assert g == {(0, 0): "a b2"}


def test_hostile_span_cap_bounds_memory_not_output():
    # budget of 4 marks: first cell (rowspan 2 x colspan 2 = 4 marks)
    # reserves; second spanning cell exceeds the remaining budget so
    # it emits but reserves only its own slot
    rows = _cells(
        '<table><tr><td rowspan=2 colspan=2>x</td>'
        '<td rowspan=2 colspan=2>y</td></tr>'
        "<tr><td>z</td></tr></table>",
        max_grid_cells=4,
    )
    g = {(r, c): t for _, _, r, c, _, _, _, t in rows}
    assert g[(0, 0)] == "x" and g[(0, 2)] == "y"
    # y's rowspan was NOT reserved, so z lands at col 2 (x's still is)
    assert g[(1, 2)] == "z"
    # declared spans still emitted as parsed
    y = next(r for r in rows if r[7] == "y")
    assert (y[4], y[5]) == (2, 2)


def test_tr_outside_any_table_ignored_and_empty_page():
    assert _cells("<tr><td>stray</td></tr>") == [
        # WHATWG: <tr> outside a table is dropped entirely by the
        # treebuilder, so no table and no cells
    ] or _cells("<tr><td>stray</td></tr>") == []
    assert _cells("") == []
    assert _cells("<p>no tables here</p>") == []


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-tables-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_extract_tables_spark_path(spark):
    from hickoryspark.ops.tables import extract_tables

    pages = spark.createDataFrame(
        [
            ("u1", "<table><tr><th>h</th></tr><tr><td rowspan=2>x</td>"
                   "<td>a</td></tr><tr><td>b</td></tr></table>"),
            ("u2", "<p>none</p>"),
            ("u3", None),
        ],
        "url string, html string",
    )
    rows = sorted(
        extract_tables(pages).collect(),
        key=lambda r: (r["url"], r["row_idx"], r["col_idx"]),
    )
    assert [r["url"] for r in rows] == ["u1"] * 4
    assert [(r["row_idx"], r["col_idx"], r["cell_text"]) for r in rows] == [
        (0, 0, "h"),
        (1, 0, "x"),
        (1, 1, "a"),
        (2, 1, "b"),
    ]
    assert rows[0]["is_header"] is True and rows[1]["rowspan"] == 2


def test_table_column_profile(spark):
    from hickoryspark.ops.tables import (extract_tables,
                                         table_column_profile)

    html = ('<table><tr><th>name</th><th>price</th><th>pct</th></tr>'
            '<tr><td>ab</td><td>1,234.50</td><td>12%</td></tr>'
            '<tr><td>cd</td><td>-7</td><td></td></tr>'
            '<tr><td>ef</td><td>n/a</td><td>+3.5%</td></tr></table>')
    pages = spark.createDataFrame([("u", html)],
                                  "url string, html string")
    got = sorted(tuple(r) for r in
                 table_column_profile(extract_tables(pages)).collect())
    assert got == [
        ("u", 0, 0, 3, 0, 0, 0),     # label column
        ("u", 0, 1, 3, 2, 0, 666),   # 'n/a' breaks the numeric share
        ("u", 0, 2, 3, 2, 1, 1000),  # empty cell out of the base
    ]
