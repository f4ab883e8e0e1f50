"""OPML outline parsing — subscription-list ingestion.

OPML 2.0 is the interchange format for feed subscription lists
(blogrolls, podcast apps, reader exports); a feed crawl seeds from
OPML exactly as it seeds from sitemaps and autodiscovered feeds
(ops/feeds.py) — this op turns an OPML payload into one row per
``<outline>`` with the subscription attributes.

Pinned semantics:

- one row per ``<outline>`` start tag (container or self-closing) in
  document order (``pos``, 0-based); ``depth`` = number of open
  outline containers strictly above it (body children = 0; close
  tags floor at 0 — stray closes cannot go negative);
- attributes ``text``, ``title``, ``type``, ``xmlUrl`` → xml_url,
  ``htmlUrl`` → html_url, matched ASCII-case-insensitively
  (first occurrence wins), entity-unescaped with the shared sitemaps
  machinery (surrogate-range refs stay literal); missing → NULL;
- the head ``<title>`` (first title tag) rides every row as
  ``opml_title``;
- gzip payloads supported; corrupt gzip / NULL payloads degrade to
  0 rows (the feeds/sitemaps rule — never a task-killing raise).

Spark surface mirrors parse_sitemaps_df: one shuffle-free
``mapInPandas`` over (host, payload) rows.
"""

from __future__ import annotations

import gzip
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

from hickoryspark.ops.sitemaps import _unescape

OPML_SCHEMA = (
    "host string, opml_title string, pos long, depth long, "
    "text string, title string, type string, xml_url string, "
    "html_url string"
)

#: start-tag attrs scan respects quoted values — XML allows a raw
#: '>' inside "..."/'...' (only '<' and '&' are forbidden there), so
#: a naive [^>]* would truncate the tag at it (review finding,
#: regression-tested)
_OUTLINE_RE = re.compile(
    r"""<outline\b((?:[^>"']|"[^"]*"|'[^']*')*?)(/?)>"""
    r"|</outline\s*>", re.S | re.I)
_HEAD_TITLE_RE = re.compile(
    r"<title\b[^>]*>\s*(.*?)\s*</title>", re.S | re.I)
_ATTR_RE = re.compile(
    r"""\b([A-Za-z][A-Za-z0-9]*)\s*=\s*("([^"]*)"|'([^']*)')""", re.S)

_WANTED = {"text": "text", "title": "title", "type": "type",
           "xmlurl": "xml_url", "htmlurl": "html_url"}


def parse_opml(payload: bytes) -> list[dict]:
    """OPML payload → outline rows (possibly empty)."""
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError, zlib.error):
            return []
    try:
        doc = payload.decode("utf-8", errors="replace")
    except Exception:
        return []
    mt = _HEAD_TITLE_RE.search(doc)
    opml_title = _unescape(mt.group(1)) if mt else None
    rows: list[dict] = []
    depth = 0
    pos = 0
    for m in _OUTLINE_RE.finditer(doc):
        if m.group(1) is None:  # </outline>
            depth = max(0, depth - 1)
            continue
        attrs: dict[str, str] = {}
        for am in _ATTR_RE.finditer(m.group(1)):
            key = am.group(1).lower()
            if key in _WANTED and _WANTED[key] not in attrs:
                val = am.group(3) if am.group(3) is not None \
                    else am.group(4)
                attrs[_WANTED[key]] = _unescape(val)
        rows.append({
            "opml_title": opml_title, "pos": pos, "depth": depth,
            "text": attrs.get("text"), "title": attrs.get("title"),
            "type": attrs.get("type"),
            "xml_url": attrs.get("xml_url"),
            "html_url": attrs.get("html_url"),
        })
        pos += 1
        if not m.group(2):  # container (not self-closing)
            depth += 1
    return rows


def parse_opml_df(opml: DataFrame, host_col: str = "host",
                  payload_col: str = "payload") -> DataFrame:
    """(host, payload binary) → outline rows; shuffle-free."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            out: list[dict] = []
            for host, payload in zip(b[host_col], b[payload_col]):
                if payload is None:
                    continue
                for row in parse_opml(bytes(payload)):
                    out.append({"host": host, **row})
            yield pd.DataFrame(
                out, columns=["host", "opml_title", "pos", "depth",
                              "text", "title", "type", "xml_url",
                              "html_url"])

    return opml.select(host_col, payload_col).mapInPandas(
        gen, OPML_SCHEMA)
