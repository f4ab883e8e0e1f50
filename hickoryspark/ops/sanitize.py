"""HTML sanitization — allowlist tree transform + re-render.

The hickory-native safety op: untrusted web HTML goes through the
real parser (html/core.py), an allowlist transform over the hickory
tree, and the real renderer (html/render.py), so the output is
well-formed, attribute-escaped HTML with scripting/active content
removed — the standard pre-publication / pre-annotation step for a
web corpus (same policy class as bleach/OWASP sanitizers, pinned
explicitly below; no code from either).

Pinned policy (every rule is deliberate — change only with the gate
oracle):

- DROP (whole subtree): ``script style iframe frame frameset object
  embed applet noscript template form input button select textarea
  base meta link title`` — active/metadata content and form chrome.
- ALLOW (kept; attributes filtered): document structure ``html head
  body`` plus the classic text/markup set ``a abbr b blockquote br
  caption code dd div dl dt em figcaption figure h1-h6 hr i img li
  mark ol p pre q s small span strong sub sup table tbody td tfoot
  th thead tr u ul``.
- Everything else: UNWRAP — the element is removed, its children are
  spliced in place (svg/math subtrees therefore lose their foreign
  wrappers but keep text).
- Comments and doctypes drop silently (not counted).
- Attribute allowlist: global ``class id title lang dir``; per-tag
  extras ``a:{href rel}``, ``img:{src alt width height}``,
  ``td/th:{colspan rowspan}``, ``blockquote/q:{cite}``. Everything
  else (event handlers, style, data-*) is dropped and counted.
- URL-valued attributes (``a href``, ``img src``, ``blockquote/q
  cite``) pass only when, after stripping leading/trailing C0+space
  and removing [\\t\\n\\r] everywhere (the WHATWG URL-parser strip —
  closes the ``jav\\tascript:`` bypass class), they are either
  scheme-less (relative) or carry an ``http``/``https``/``mailto``
  scheme (ASCII case-insensitive). Blocked URLs drop the attribute
  and count in ``n_blocked_urls`` (not ``n_dropped_attrs``).

The transform is an ITERATIVE stack machine (hostile nesting depth
cannot blow the Python stack — the ops/markdown.py rule).

Scale shape: one shuffle-free mapInPandas pass over pages
(parse → transform → render per row, the sanctioned Python-in-Arrow
cost class shared with the extract path); binary input goes through
the same charset sniff as extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from hickoryspark.html.charset import decode_html
from hickoryspark.html.core import as_hickory, parse
from hickoryspark.html.render import hickory_to_html

__all__ = ["sanitize_tree", "sanitize_html", "sanitize_pages",
           "DROP_TAGS", "ALLOW_TAGS", "GLOBAL_ATTRS", "TAG_ATTRS",
           "URL_ATTRS", "SAFE_SCHEMES"]

DROP_TAGS = frozenset(
    "script style iframe frame frameset object embed applet noscript "
    "template form input button select textarea base meta link title"
    .split())

ALLOW_TAGS = frozenset(
    "html head body a abbr b blockquote br caption code dd div dl dt "
    "em figcaption figure h1 h2 h3 h4 h5 h6 hr i img li mark ol p pre "
    "q s small span strong sub sup table tbody td tfoot th thead tr "
    "u ul".split())

GLOBAL_ATTRS = frozenset(["class", "id", "title", "lang", "dir"])

TAG_ATTRS = {
    "a": frozenset(["href", "rel"]),
    "img": frozenset(["src", "alt", "width", "height"]),
    "td": frozenset(["colspan", "rowspan"]),
    "th": frozenset(["colspan", "rowspan"]),
    "blockquote": frozenset(["cite"]),
    "q": frozenset(["cite"]),
}

#: (tag, attr) pairs whose value is a URL and must pass the scheme rule
URL_ATTRS = frozenset([
    ("a", "href"), ("img", "src"), ("blockquote", "cite"), ("q", "cite"),
])

SAFE_SCHEMES = frozenset(["http", "https", "mailto"])

_C0_SPACE = "".join(chr(c) for c in range(0x21))


def _url_allowed(value: str) -> bool:
    v = value.strip(_C0_SPACE)
    v = v.replace("\t", "").replace("\n", "").replace("\r", "")
    colon = v.find(":")
    if colon < 0:
        return True
    head = v[:colon]
    # a ':' before any valid scheme terminator means an (attempted)
    # scheme; non-scheme-shaped heads (e.g. containing '/') are
    # relative path refs
    for ch in "/?#":
        if ch in head:
            return True
    if not head or not head[0].isascii() or not head[0].isalpha():
        return False
    return head.lower() in SAFE_SCHEMES


def _filter_attrs(tag: str, attrs, counts) -> dict | None:
    if not attrs:
        return None
    allowed = GLOBAL_ATTRS | TAG_ATTRS.get(tag, frozenset())
    out = {}
    for k, v in attrs.items():
        if k not in allowed:
            counts[2] += 1
            continue
        if (tag, k) in URL_ATTRS and not _url_allowed(
                v if isinstance(v, str) else ""):
            counts[3] += 1
            continue
        out[k] = v
    return out or None


def sanitize_tree(root) -> tuple[object, tuple[int, int, int, int]]:
    """hickory tree → (sanitized tree, (n_dropped, n_unwrapped,
    n_dropped_attrs, n_blocked_urls)). The root (document or element)
    is never itself dropped/unwrapped."""
    counts = [0, 0, 0, 0]
    # frames: [children, idx, acc, finish] — finish closes the frame's
    # node into the parent frame's acc ('root' returns instead)
    kids = root.get("content") or []
    root_kind = ("document" if root.get("type") == "document"
                 else "element")
    stack = [[kids, 0, [], ("root", root)]]
    result = None
    while stack:
        frame = stack[-1]
        children, idx, acc, finish = frame
        if idx < len(children):
            frame[1] += 1
            node = children[idx]
            if isinstance(node, str):
                acc.append(node)
                continue
            ntype = node.get("type")
            if ntype == "comment" or ntype == "document-type":
                continue
            if ntype != "element":
                continue
            tag = node["tag"]
            if tag in DROP_TAGS:
                counts[0] += 1
                continue
            if tag in ALLOW_TAGS:
                stack.append(
                    [node.get("content") or [], 0, [], ("element", node)])
            else:
                counts[1] += 1
                stack.append(
                    [node.get("content") or [], 0, [], ("splice",)])
            continue
        stack.pop()
        kind = finish[0]
        if kind == "element":
            node = finish[1]
            new = {
                "type": "element",
                "tag": node["tag"],
                "attrs": _filter_attrs(node["tag"], node.get("attrs"),
                                       counts),
                "content": acc or None,
            }
            stack[-1][2].append(new)
        elif kind == "splice":
            stack[-1][2].extend(acc)
        else:  # root
            node = finish[1]
            if root_kind == "document":
                result = {"type": "document", "content": acc or None}
            else:
                result = {
                    "type": "element",
                    "tag": node["tag"],
                    "attrs": _filter_attrs(node["tag"],
                                           node.get("attrs"), counts),
                    "content": acc or None,
                }
    return result, tuple(counts)


def sanitize_html(html: str) -> tuple[str, tuple[int, int, int, int]]:
    """Untrusted HTML string → (sanitized HTML, counts)."""
    tree, counts = sanitize_tree(as_hickory(parse(html)))
    return hickory_to_html(tree), counts


SANITIZE_SCHEMA = (
    "url string, clean_html string, n_dropped long, n_unwrapped long, "
    "n_dropped_attrs long, n_blocked_urls long")


def sanitize_pages(pages: DataFrame, url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """pages (binary or string html) → sanitized html + audit counts;
    one shuffle-free mapInPandas pass."""
    is_binary = dict(pages.dtypes)[html_col] == "binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            urls, cleans, c0, c1, c2, c3 = [], [], [], [], [], []
            for u, h in zip(b[url_col], b[html_col]):
                if h is None:
                    continue
                text = decode_html(h) if is_binary else h
                clean, counts = sanitize_html(text)
                urls.append(u)
                cleans.append(clean)
                c0.append(counts[0])
                c1.append(counts[1])
                c2.append(counts[2])
                c3.append(counts[3])
            yield pd.DataFrame({
                "url": urls, "clean_html": cleans,
                "n_dropped": pd.array(c0, dtype="int64"),
                "n_unwrapped": pd.array(c1, dtype="int64"),
                "n_dropped_attrs": pd.array(c2, dtype="int64"),
                "n_blocked_urls": pd.array(c3, dtype="int64"),
            })

    return pages.select(url_col, html_col).mapInPandas(
        gen, SANITIZE_SCHEMA)
