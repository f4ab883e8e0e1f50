"""HTML → Markdown conversion — the LLM-corpus text rendering.

Training-data pipelines convert crawled HTML to markdown so the model
sees document STRUCTURE (headings, lists, tables, code) instead of
either raw markup or flattened text. This renderer walks the parsed
hickory tree (the same from-scratch WHATWG parse every other operator
uses — reference src/clj/hickory/core.clj:150-154) and emits a fixed,
documented markdown dialect, per page inside Arrow-batched
``mapInPandas`` — map-only, no shuffle, the extract_pages cost class.

Dialect (fixed so oracles can reproduce it; deliberately lossy — the
lossless path is render.py's ``hickory_to_html``):

- Blocks are separated by ONE blank line; empty blocks are dropped.
- ``h1``-``h6`` → ``#``-prefixed lines; ``p``/``dt``/``dd``/
  ``figcaption`` → paragraph blocks; ``hr`` → ``---``.
- Inline: ``b``/``strong`` → ``**``, ``i``/``em`` → ``*``, ``code`` →
  backticks — boundary whitespace moves OUTSIDE the marker so
  ``o<b> k</b>`` yields ``o **k**``; empty wrappers vanish. ``a`` with
  an ``href`` → ``[text](href)`` (no href → bare text); ``img`` with a
  ``src`` → ``![alt](src)`` (no src → nothing); ``br`` → newline
  within its block. Markdown metacharacters in text are NOT escaped.
- Lists: ``ul`` items as ``- ``, ``ol`` items numbered from 1 in
  document order (the ``start`` attribute is ignored); nested blocks
  inside an ``li`` continue on their own lines indented two spaces.
- ``blockquote`` → every line of its rendered content prefixed
  ``> ``; ``pre`` → a backtick fence (lengthened past any backtick
  run in the payload) around the subtree's VERBATIM text.
- Tables render as pipe rows from the SAME grid tables_doc computes
  (spans placed, thead/body/tfoot rendering order, nested-table text
  excluded); a leading all-``th`` row gets a ``| --- |`` separator.
  Column gaps from spans are skipped (markdown has no colspan). A
  nested table renders as its own pipe block immediately after its
  outer table, in document (pre-) order.
- ``script``/``style``/``template``/``head`` subtrees and comments
  contribute nothing; every other unknown element is transparent
  (children render in place; ``div``-like containers listed in
  ``_CONTAINERS`` additionally force paragraph breaks at their
  boundary).

Text handling: each text node collapses ASCII whitespace runs to one
space (newlines survive only via ``br`` and ``pre``); block text is
trimmed. The walk is an explicit stack machine — no recursion, so
hostile nesting depth cannot overflow, matching the parser's own
iterative design.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from hickoryspark.html.charset import decode_html
from hickoryspark.html.core import as_hickory, parse
from hickoryspark.nodes import Doc, TYPE_ELEMENT, TYPE_TEXT, flatten
from hickoryspark.ops.tables import tables_doc

MARKDOWN_SCHEMA = "url string, markdown string"

_SKIP = {"script", "style", "template", "head"}
_WRAP = {"b": "**", "strong": "**", "i": "*", "em": "*", "code": "`"}
_HEADINGS = {f"h{k}": k for k in range(1, 7)}
_PARAGRAPH = {"p", "dt", "dd", "figcaption"}
#: containers that force a paragraph break at their boundary; any
#: element in none of the sets above is transparent inline
_CONTAINERS = {
    "div", "section", "article", "main", "aside", "header", "footer",
    "nav", "figure", "body", "html", "dl", "details", "center",
}

_WS_RUN = re.compile(r"[ \t\n\f\r]+")
_SPACE_RUN = re.compile(r"[ \t]+")
_NL_TRIM = re.compile(r" ?\n ?")
_TICKS = re.compile(r"`+")


def _block_text(pieces: list[str]) -> str:
    s = _SPACE_RUN.sub(" ", "".join(pieces))
    return _NL_TRIM.sub("\n", s).strip()


def _coalesce(parts: list[tuple[str, str]]) -> list[str]:
    """Tagged child parts → block strings: consecutive inline runs
    become one paragraph, blocks pass through, empties drop."""
    blocks: list[str] = []
    run: list[str] = []
    for kind, s in parts:
        if kind == "i":
            run.append(s)
        else:
            if run:
                t = _block_text(run)
                if t:
                    blocks.append(t)
                run = []
            if s:
                blocks.append(s)
    if run:
        t = _block_text(run)
        if t:
            blocks.append(t)
    return blocks


def _wrap_inline(parts: list[tuple[str, str]], mark: str) -> str:
    inner = "".join(s for _, s in parts)
    core = inner.strip()
    if not core:
        return inner
    lead = inner[: len(inner) - len(inner.lstrip())]
    trail = inner[len(inner.rstrip()):]
    return f"{lead}{mark}{core}{mark}{trail}"


def markdown_doc(doc: Doc) -> str:
    """One parsed Doc → markdown string (dialect in module docstring)."""
    n = doc.n
    types = doc.types.tolist()
    parent = doc.parent.tolist()
    sub_end = doc.subtree_end.tolist()
    tags = doc.tags
    texts = doc.texts
    attrs = doc.attrs

    children: list[list[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        p = parent[i]
        if p >= 0:
            children[p].append(i)

    # pipe-table grids, grouped by the table element's pre position —
    # skipped entirely for the common table-less page (tables_doc
    # costs three extra O(n) sweeps; this is a hot map stage)
    grid: dict[int, dict[int, list[tuple[int, bool, str]]]] = {}
    if "table" in tags:
        for _, tp, r, c, _, _, hd, txt in tables_doc(doc):
            grid.setdefault(tp, {}).setdefault(r, []).append((c, hd, txt))

    def render_tables(t: int) -> str:
        out = []
        for tp in sorted(p for p in grid if t <= p <= sub_end[t]):
            rows = grid[tp]
            lines = []
            for r in sorted(rows):
                cells = sorted(rows[r])
                lines.append("| " + " | ".join(x[2] for x in cells) + " |")
                if r == 0 and cells and all(x[1] for x in cells):
                    lines.append("| " + " | ".join("---" for _ in cells) + " |")
            if lines:
                out.append("\n".join(lines))
        return "\n\n".join(out)

    def raw_text(c: int) -> str:
        pieces = []
        for j in range(c, sub_end[c] + 1):
            if types[j] == TYPE_TEXT and types[parent[j]] == TYPE_ELEMENT:
                pieces.append(texts[j] or "")
        return "".join(pieces)

    def fenced(raw: str) -> str:
        runs = _TICKS.findall(raw)
        fence = "`" * max(3, max((len(x) for x in runs), default=0) + 1)
        return f"{fence}\n{raw.strip(chr(10))}\n{fence}"

    def combine(node: int, parts: list[tuple[str, str]]):
        if node == 0 or types[node] != TYPE_ELEMENT:
            return [("b", s) for s in _coalesce(parts)]
        tag = tags[node]
        if tag in _WRAP:
            return [("i", _wrap_inline(parts, _WRAP[tag]))]
        if tag == "a":
            a = attrs[node]
            href = a.get("href") if a else None
            if href is None:
                return parts
            inner = "".join(s for _, s in parts)
            core = inner.strip()
            lead = inner[: len(inner) - len(inner.lstrip())]
            trail = inner[len(inner.rstrip()):]
            return [("i", f"{lead}[{core}]({href}){trail}")]
        if tag in _HEADINGS:
            t = _block_text([s for _, s in parts])
            return [("b", f"{'#' * _HEADINGS[tag]} {t}")] if t else []
        if tag in _PARAGRAPH:
            return [("b", s) for s in _coalesce(parts)]
        if tag == "li":
            blocks = _coalesce(parts)
            if not blocks:
                return [("li", "")]
            rest = [
                "\n".join("  " + ln for ln in b.split("\n"))
                for b in blocks[1:]
            ]
            return [("li", "\n".join([blocks[0], *rest]))]
        if tag in ("ul", "ol"):
            # non-li children are legal HTML (e.g. <ul><p>…</p><li>…)
            # — render them as plain lines in place rather than
            # silently dropping their text
            lines: list[str] = []
            run: list[str] = []
            n_item = 0

            def _flush() -> None:
                t = _block_text(run)
                run.clear()
                if t:
                    lines.append(t)

            for k, s in parts:
                if k == "li":
                    _flush()
                    n_item += 1
                    head, *cont = s.split("\n")
                    mark = "- " if tag == "ul" else f"{n_item}. "
                    lines.append(mark + head)
                    lines.extend(cont)
                elif k == "i":
                    run.append(s)
                else:
                    _flush()
                    if s:
                        lines.append(s)
            _flush()
            if not lines:
                return []
            return [("b", "\n".join(lines))]
        if tag == "blockquote":
            body = "\n\n".join(_coalesce(parts))
            if not body:
                return []
            return [("b", "\n".join(
                ("> " + ln).rstrip() for ln in body.split("\n")
            ))]
        if tag in _CONTAINERS:
            return [("b", s) for s in _coalesce(parts)]
        return parts  # transparent inline

    # explicit stack machine: [node, parts, child-cursor]
    root_parts: list[tuple[str, str]] = []
    stack: list[list] = [[0, root_parts, 0]]
    while stack:
        frame = stack[-1]
        node, parts, k = frame
        ch = children[node]
        if k < len(ch):
            frame[2] += 1
            c = ch[k]
            t = types[c]
            if t == TYPE_TEXT:
                if types[node] == TYPE_ELEMENT or node == 0:
                    parts.append(("i", _WS_RUN.sub(" ", texts[c] or "")))
                continue  # comment payload strings contribute nothing
            if t != TYPE_ELEMENT:
                continue  # comments/doctypes (their subtrees too)
            tag = tags[c]
            if tag in _SKIP:
                continue
            if tag == "table":
                s = render_tables(c)
                if s:
                    parts.append(("b", s))
                continue
            if tag == "br":
                parts.append(("i", "\n"))
                continue
            if tag == "hr":
                parts.append(("b", "---"))
                continue
            if tag == "img":
                a = attrs[c]
                src = a.get("src") if a else None
                if src is not None:
                    alt = (a.get("alt") or "") if a else ""
                    parts.append(("i", f"![{alt}]({src})"))
                continue
            if tag == "pre":
                parts.append(("b", fenced(raw_text(c))))
                continue
            stack.append([c, [], 0])
        else:
            stack.pop()
            res = combine(node, parts)
            if stack:
                stack[-1][1].extend(res)
            else:
                return "\n\n".join(_coalesce(res))
    return ""


def _markdown_batch(batch: pd.DataFrame) -> pd.DataFrame:
    urls, mds = [], []
    for url, html in zip(batch["url"], batch["html"]):
        try:
            if html is None:
                html = ""
            elif isinstance(html, (bytes, bytearray, memoryview)):
                html = decode_html(html)
            md = markdown_doc(flatten(as_hickory(parse(html))))
        except Exception:
            md = ""  # keep the job alive (nodes_table policy)
        urls.append(url)
        mds.append(md)
    return pd.DataFrame({"url": urls, "markdown": mds})


def to_markdown(pages_df):
    """pages(url, html, ...) → (url, markdown), map-only Arrow stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield _markdown_batch(b)

    return pages_df.select("url", "html").mapInPandas(gen, MARKDOWN_SCHEMA)
