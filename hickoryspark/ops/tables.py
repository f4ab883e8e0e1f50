"""HTML table extraction — tables flattened to grid-addressed cell rows.

The structured-data side of the extraction engine: every ``<table>``
on a page becomes a set of cell rows addressed by (table_idx, row_idx,
col_idx) after applying the HTML table processing model's span
placement (WHATWG HTML §4.9.12 "forming a table"), so downstream
consumers get relational data (schema inference, web-table corpora,
entity extraction) instead of markup.

The walk reuses the engine's parse path (hickoryspark.html — the same
from-scratch WHATWG parser the reference's ``parse``/``as-hickory``
pair maps to, reference src/clj/hickory/core.clj:150-154 /
:107-145) and runs per page inside Arrow-batched ``mapInPandas`` —
embarrassingly parallel, no shuffle, columns pruned to (url, html)
before the Python exchange, exactly the extract_pages cost class
(spark/extract.py). At 100 TB this is a map-only stage over the pages
scan.

Semantics (fixed, documented so oracles can reproduce them):

- Tables are indexed by document (pre-) order; a nested table is its
  OWN table_idx — its cells never leak into the outer cell's text.
- Rows are the ``<tr>`` elements whose nearest ancestor table is this
  table, ordered thead-rows first, then body rows (direct ``<tr>`` or
  ``<tbody>`` rows in document order), then tfoot rows — the HTML
  rendering order, not raw document order.
- Cells are the direct ``<td>``/``<th>`` children of each row.
  ``colspan`` is clamped to [1, 1000] and ``rowspan`` to [0, 65534]
  per the HTML spec's attribute clamps; ``rowspan=0`` spans to the
  last row of the table. Span attributes parse as HTML non-negative
  integers (leading ASCII whitespace + digits; anything else →
  default 1).
- Placement: each cell lands on the first free column at-or-right of
  the running cursor, after earlier rows' rowspans are accounted —
  the "find the next open slot" step of the spec's algorithm.
- ``cell_text`` is the cell subtree's text nodes in pre-order —
  excluding nested-table content and comment payloads — each
  stripped, empties dropped, joined with single spaces (the same
  normalization as extract_doc's main_text, spark/extract.py).

Hostile-input bound: span occupancy marking is capped at
``max_grid_cells`` marks per table (default 1M); past the cap,
further rowspans stop reserving slots (cells still emit with their
declared spans). A crafted page can therefore skew placement of its
own later cells, but never a task's memory.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from hickoryspark.html.charset import decode_html
from hickoryspark.html.core import as_hickory, parse
from hickoryspark.nodes import Doc, TYPE_ELEMENT, TYPE_TEXT, flatten

TABLES_SCHEMA = (
    "url string, table_idx int, table_pre int, row_idx int, col_idx int, "
    "rowspan int, colspan int, is_header boolean, cell_text string"
)

#: HTML spec clamps (WHATWG HTML §4.9.11: colspan 1-1000, rowspan 0-65534)
MAX_COLSPAN = 1000
MAX_ROWSPAN = 65534

#: per-table cap on span occupancy marks (memory bound vs hostile spans)
DEFAULT_MAX_GRID_CELLS = 1_000_000

_SPAN_RE = re.compile(r"[ \t\n\f\r]*([0-9]+)")

#: row-group rank: thead rows render first, tfoot rows last
_SECTION_RANK = {"thead": 0, "tfoot": 2}


def _parse_span(attrs, key: str, default: int, lo: int, hi: int) -> int:
    """HTML non-negative-integer attribute parse with spec clamping."""
    if not attrs:
        return default
    v = attrs.get(key)
    if v is None:
        return default
    m = _SPAN_RE.match(v)
    if not m:
        return default
    return min(max(int(m.group(1)), lo), hi)


def tables_doc(doc: Doc, max_grid_cells: int = DEFAULT_MAX_GRID_CELLS):
    """One parsed Doc → list of cell tuples
    (table_idx, table_pre, row_idx, col_idx, rowspan, colspan,
    is_header, cell_text).

    Hot path follows the extract_doc pattern: plain Python lists, one
    forward sweep for structure, then per-table grid placement.
    """
    n = doc.n
    types = doc.types.tolist()
    parent = doc.parent.tolist()
    sub_end = doc.subtree_end.tolist()
    tags = doc.tags
    texts = doc.texts
    attrs = doc.attrs

    # enc[i]: nearest STRICT ancestor that is a <table> (or -1).
    # Pre-order guarantees parent < child, so one forward pass.
    enc = [-1] * n
    tables: list[int] = []
    for i in range(n):
        p = parent[i]
        if p >= 0:
            enc[i] = p if (types[p] == TYPE_ELEMENT and tags[p] == "table") else enc[p]
        if types[i] == TYPE_ELEMENT and tags[i] == "table":
            tables.append(i)

    # rows per table, collected in one sweep (document order)
    rows_of: dict[int, list[int]] = {t: [] for t in tables}
    for i in range(n):
        if types[i] == TYPE_ELEMENT and tags[i] == "tr" and enc[i] >= 0:
            rows_of[enc[i]].append(i)

    # direct td/th children per row — children are contiguous in
    # pre-order only per subtree, so index by parent in one sweep
    cells_of: dict[int, list[int]] = {}
    for i in range(n):
        if types[i] == TYPE_ELEMENT and tags[i] in ("td", "th"):
            p = parent[i]
            if p >= 0 and tags[p] == "tr":
                cells_of.setdefault(p, []).append(i)

    out = []
    for t_idx, t in enumerate(tables):
        # rendering order: thead rows, then body rows, then tfoot rows;
        # stable within each group (document order)
        trs = sorted(
            rows_of[t],
            key=lambda r: (
                _SECTION_RANK.get(
                    tags[parent[r]] if parent[r] >= 0 else "", 1
                ),
            ),
        )
        nrows = len(trs)
        taken: list[set[int]] = [set() for _ in range(nrows)]
        budget = max_grid_cells
        for r, tr in enumerate(trs):
            col = 0
            for c in cells_of.get(tr, ()):
                while col in taken[r]:
                    col += 1
                cs = _parse_span(attrs[c], "colspan", 1, 1, MAX_COLSPAN)
                rs = _parse_span(attrs[c], "rowspan", 1, 0, MAX_ROWSPAN)
                rs = nrows - r if rs == 0 else min(rs, nrows - r)
                marks = rs * cs
                if budget >= marks:
                    budget -= marks
                    for rr in range(r, r + rs):
                        row_taken = taken[rr]
                        for cc in range(col, col + cs):
                            row_taken.add(cc)
                else:  # cap hit: emit but stop reserving (doc above)
                    taken[r].add(col)

                pieces = []
                for j in range(c, sub_end[c] + 1):
                    if types[j] != TYPE_TEXT or enc[j] != t:
                        continue  # nested-table text belongs there
                    p = parent[j]
                    if p >= 0 and types[p] != TYPE_ELEMENT:
                        continue  # comment payload rows
                    s = (texts[j] or "").strip()
                    if s:
                        pieces.append(s)
                out.append(
                    (
                        t_idx,
                        t,
                        r,
                        col,
                        rs,
                        cs,
                        tags[c] == "th",
                        " ".join(pieces),
                    )
                )
                col += cs
    return out


def _tables_batch(batch: pd.DataFrame, max_grid_cells: int) -> pd.DataFrame:
    cols: dict[str, list] = {
        "url": [], "table_idx": [], "table_pre": [], "row_idx": [],
        "col_idx": [], "rowspan": [], "colspan": [], "is_header": [],
        "cell_text": [],
    }
    for url, html in zip(batch["url"], batch["html"]):
        try:
            if html is None:
                html = ""
            elif isinstance(html, (bytes, bytearray, memoryview)):
                html = decode_html(html)
            doc = flatten(as_hickory(parse(html)))
            rows = tables_doc(doc, max_grid_cells)
        except Exception:
            rows = []  # keep the job alive (nodes_table policy)
        for ti, tp, r, c, rs, cs, hd, txt in rows:
            cols["url"].append(url)
            cols["table_idx"].append(ti)
            cols["table_pre"].append(tp)
            cols["row_idx"].append(r)
            cols["col_idx"].append(c)
            cols["rowspan"].append(rs)
            cols["colspan"].append(cs)
            cols["is_header"].append(hd)
            cols["cell_text"].append(txt)
    return pd.DataFrame(cols)


def extract_tables(pages_df, max_grid_cells: int = DEFAULT_MAX_GRID_CELLS):
    """pages(url, html, ...) → cell rows, Arrow-batched map-only stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield _tables_batch(b, max_grid_cells)

    return pages_df.select("url", "html").mapInPandas(gen, TABLES_SCHEMA)


def table_records(cells) -> "DataFrame":
    """Cell grid (``extract_tables`` output) → header-keyed records —
    the WikiTables-style "table to facts" step that turns infobox /
    spec-sheet tables into (key, value) training rows.

    Pinned semantics (the gate oracle reproduces them):

    - a table QUALIFIES iff it has at least one row-0 cell and EVERY
      row-0 cell is a header (``th``) — data-first tables yield no
      records (layout tables, not fact tables);
    - the KEY for grid column ``c`` is the text of the row-0 cell
      whose ``[col_idx, col_idx + colspan)`` span covers ``c``;
    - every cell in rows >= 1 (``td`` AND ``th`` — row-header ths are
      values here) emits one record at its ANCHOR column:
      ``(url, table_idx, record_idx = row_idx, col_idx, key, value)``;
      a data cell wider than the header keeps its row with ``key``
      NULL (lossless — the consumer decides);
    - ``record_idx`` is the grid row index (rendering order, 0 = the
      header row, so records start at 1).

    Scale shape: one groupBy + two joins, ALL keyed by
    (url, table_idx) — a single co-partitioned shuffle family; the
    header-column explode is bounded by the WHATWG colspan clamp
    (1000) times the header row width.
    """
    from pyspark.sql import DataFrame, functions as F  # noqa: F811

    key = ["url", "table_idx"]
    row0 = cells.where(F.col("row_idx") == 0)
    qualified = (
        row0.groupBy(*key)
        .agg(F.min(F.col("is_header").cast("int")).alias("_allh"))
        .where(F.col("_allh") == 1)
        .select(*key)
    )
    headers = (
        row0.join(qualified, key, "left_semi")
        .select(
            *key,
            F.explode(
                F.sequence(
                    F.col("col_idx"),
                    F.col("col_idx") + F.col("colspan") - 1,
                )
            ).alias("h_col"),
            F.col("cell_text").alias("key"),
        )
    )
    data = cells.where(F.col("row_idx") >= 1).join(qualified, key, "left_semi")
    out = data.join(
        headers.withColumnRenamed("h_col", "col_idx"),
        key + ["col_idx"],
        "left",
    )
    return out.select(
        "url", "table_idx",
        F.col("row_idx").alias("record_idx"),
        "col_idx", "key",
        F.col("cell_text").alias("value"),
    )


#: pinned numeric-cell rule (ASCII-only, Java-regex ∩ RE2 — character
#: classes only): optional sign, digits with comma groups, optional
#: decimal tail, optional trailing percent
NUMERIC_CELL_RE = r"^[+-]?[0-9][0-9,]*([.][0-9]+)?%?$"


def table_column_profile(cells) -> "DataFrame":
    """Cell grid (``extract_tables`` output) → per-column typing
    profile: ``(url, table_idx, col_idx, n_cells, n_numeric, n_empty,
    numeric_milli)`` — the column-typing signal table-QA corpus
    builders cut on (a column that is 95% numeric is a measure, not a
    label).

    Pinned semantics: DATA cells only (``row_idx >= 1`` — row 0 is
    the candidate header, profiled by ``table_records``); a cell
    anchors at its own ``col_idx`` (spans don't fan out); NUMERIC =
    the ASCII-trimmed text matches ``NUMERIC_CELL_RE``; EMPTY = the
    trimmed text is ``''`` (empty cells count in ``n_cells`` but in
    neither class); ``numeric_milli = (1000 * n_numeric) div
    greatest(n_cells - n_empty, 1)`` — typed share of NON-empty
    cells. One groupBy, map-side combinable."""
    from pyspark.sql import functions as F

    t = F.expr("btrim(cell_text, ' \\t\\n\\r')")
    return (
        cells.where(F.col("row_idx") >= 1)
        .select(
            "url", "table_idx", "col_idx",
            t.rlike(NUMERIC_CELL_RE).cast("long").alias("_num"),
            (t == "").cast("long").alias("_emp"),
        )
        .groupBy("url", "table_idx", "col_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(F.expr("CASE WHEN _emp = 0 THEN _num ELSE 0 END"))
            .cast("long").alias("n_numeric"),
            F.sum("_emp").cast("long").alias("n_empty"),
        )
        .withColumn(
            "numeric_milli",
            F.expr("(1000 * n_numeric)"
                   " div greatest(n_cells - n_empty, 1)").cast("long"),
        )
    )
