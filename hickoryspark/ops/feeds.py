"""RSS 2.0 / Atom feed parsing — the third discovery-side source next
to sitemaps (ops/sitemaps.py) and the link graph (ops/links.py): news
and blog crawls seed their frontiers and freshness schedules from
feeds.

Supported:
- RSS 2.0: one row per ``<item>`` with ``title``, ``link`` (element
  text), ``guid``, ``pubDate`` → ``published``, ``description`` →
  ``summary``; the channel ``<title>`` (the first title BEFORE the
  first item) is carried on every row as ``feed_title``.
- Atom: one row per ``<entry>`` with ``title``, ``link`` (the first
  ``<link>`` whose ``rel`` is absent or ``alternate``, per RFC 4287
  §4.2.7.2's default), ``id`` → ``guid``, ``published`` (falling back
  to ``updated``), ``summary``; feed ``<title>`` likewise.
- gzip-compressed payloads; XML entity unescaping (the sitemaps
  machinery — five built-ins + numeric references, surrogate-range
  refs left as written); a field that is entirely one CDATA section
  yields its content VERBATIM (no entity processing inside CDATA),
  otherwise markup is unescaped after CDATA markers are dropped.

Format detection: a payload whose first root-ish tag is ``<feed`` is
Atom; anything with ``<rss``/``<channel`` is RSS; both entry shapes
are scanned regardless, so hybrid garbage degrades to whatever rows
match. Entries without any of title/link/guid are dropped.

Spark surface mirrors parse_sitemaps_df: one ``mapInPandas`` over
(host, payload) rows — row-local explode, parallelism = input
partitioning, no shuffle.
"""

from __future__ import annotations

import gzip
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

from hickoryspark.ops.sitemaps import _unescape

FEED_SCHEMA = (
    "host string, kind string, feed_title string, entry_pos long, "
    "title string, link string, guid string, published string, "
    "summary string"
)

_ENTRY_RE = re.compile(r"<(item|entry)\b[^>]*>(.*?)</\1>", re.S | re.I)
_TITLE_RE = re.compile(r"<title\b[^>]*>\s*(.*?)\s*</title>", re.S | re.I)
_ATOM_LINK_RE = re.compile(r"<link\b([^>]*?)/?>", re.S | re.I)
_HREF_RE = re.compile(r"""\bhref\s*=\s*("([^"]*)"|'([^']*)')""", re.S | re.I)
_REL_RE = re.compile(r"""\brel\s*=\s*("([^"]*)"|'([^']*)')""", re.S | re.I)
_CDATA_FULL_RE = re.compile(r"\A<!\[CDATA\[(.*?)\]\]>\Z", re.S)
_CDATA_MARK_RE = re.compile(r"<!\[CDATA\[|\]\]>")

_FIELD_RES = {
    name: re.compile(rf"<{name}\b[^>]*>\s*(.*?)\s*</{name}>", re.S | re.I)
    for name in ("link", "guid", "pubDate", "description", "id",
                 "published", "updated", "summary")
}


def _text(raw: str | None) -> str | None:
    if raw is None:
        return None
    m = _CDATA_FULL_RE.match(raw)
    if m:
        return m.group(1)
    return _unescape(_CDATA_MARK_RE.sub("", raw))


def _field(body: str, name: str) -> str | None:
    m = _FIELD_RES[name].search(body)
    return _text(m.group(1)) if m else None


def _atom_link(body: str) -> str | None:
    """First <link> whose rel is absent or 'alternate' (RFC 4287)."""
    for m in _ATOM_LINK_RE.finditer(body):
        attrs = m.group(1)
        rel = _REL_RE.search(attrs)
        relval = (rel.group(2) or rel.group(3) or "").lower() if rel else ""
        if relval in ("", "alternate"):
            href = _HREF_RE.search(attrs)
            if href:
                return _unescape(href.group(2) or href.group(3) or "")
    return None


def parse_feed(payload: bytes) -> list[dict]:
    """Feed bytes (plain or gzip) -> entry dicts in document order:
    {kind, feed_title, entry_pos, title, link, guid, published,
    summary}."""
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError, zlib.error):
            # truncated header/trailer raises OSError/EOFError but a
            # corrupt DEFLATE body raises zlib.error — catch all three
            # or one hostile archive still kills the task
            return []
    text = payload.decode("utf-8", "replace")

    first_entry = _ENTRY_RE.search(text)
    head = text[: first_entry.start()] if first_entry else text
    tm = _TITLE_RE.search(head)
    feed_title = _text(tm.group(1)) if tm else None

    out = []
    for m in _ENTRY_RE.finditer(text):
        kind = "rss" if m.group(1).lower() == "item" else "atom"
        body = m.group(2)
        t = _TITLE_RE.search(body)
        title = _text(t.group(1)) if t else None
        if kind == "rss":
            link = _field(body, "link")
            guid = _field(body, "guid")
            published = _field(body, "pubDate")
            summary = _field(body, "description")
        else:
            link = _atom_link(body)
            guid = _field(body, "id")
            published = _field(body, "published") or _field(body, "updated")
            summary = _field(body, "summary")
        if title is None and link is None and guid is None:
            continue  # nothing identifying — not an entry
        out.append(
            {
                "kind": kind,
                "feed_title": feed_title,
                "entry_pos": len(out) + 1,
                "title": title,
                "link": link,
                "guid": guid,
                "published": published,
                "summary": summary,
            }
        )
    return out


def parse_feeds_df(feeds: DataFrame) -> DataFrame:
    """feeds(host, payload binary) -> exploded entry rows
    (FEED_SCHEMA); row-local, no shuffle."""
    import pandas as pd

    cols = ["kind", "feed_title", "entry_pos", "title", "link", "guid",
            "published", "summary"]

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows: dict[str, list] = {k: [] for k in ["host", *cols]}
            for host, payload in zip(b["host"], b["payload"]):
                if payload is None:
                    continue  # failed fetch: degrade, never fail
                for e in parse_feed(bytes(payload)):
                    rows["host"].append(host)
                    for k in cols:
                        rows[k].append(e[k])
            yield pd.DataFrame(rows)

    return feeds.select("host", "payload").mapInPandas(gen, FEED_SCHEMA)


#: the two autodiscoverable feed MIME types (WHATWG link rel=alternate
#: feed discovery convention; type matched ASCII-case-insensitively
#: after ASCII-ws trim)
FEED_TYPES = {"application/rss+xml": "rss", "application/atom+xml": "atom"}


def feed_autodiscovery(nodes) -> DataFrame:
    """Node table -> one row per autodiscoverable feed link:
    ``(url, feed_pos, feed_type, href, resolved, title)``.

    Pinned semantics (closed-form gate oracle):

    - a feed link is a ``<link>`` element whose ``rel`` token list
      (ASCII-ws split, case-insensitive — the ops/links.rel_nofollow
      rule) contains ``alternate``, whose ``type`` attribute
      ASCII-ws-trimmed + lowercased is ``application/rss+xml`` or
      ``application/atom+xml``, and which carries a non-NULL
      ``href``;
    - matched ANYWHERE in the document (parsers hoist head-ish
      content inconsistently; scoping to the parsed head would make
      discovery depend on tree-builder placement, documented);
    - ``feed_pos``: 1-based document-order position among the page's
      feed links; ``feed_type``: ``rss`` | ``atom``; ``title`` as
      written (NULL when absent); ``resolved`` =
      ops/links.resolve_href(url, href).

    Shape: one JVM-side filter + project off the node table; the only
    shuffle is the per-url feed_pos window.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hickoryspark.nodes import TYPE_ELEMENT
    from hickoryspark.ops.links import resolve_href
    from hickoryspark.ops.metadata import ASCII_WS_RE

    a = F.col("attrs")
    ws = " \t\n\x0b\f\r"
    mime = F.lower(F.btrim(a["type"], F.lit(ws)))
    kind = (
        F.when(mime == "application/rss+xml", F.lit("rss"))
        .when(mime == "application/atom+xml", F.lit("atom"))
    )
    links = nodes.where(
        (F.col("type") == TYPE_ELEMENT)
        & (F.col("tag") == "link")
        & a["href"].isNotNull()
        & F.array_contains(
            F.split(F.lower(F.coalesce(a["rel"], F.lit(""))), ASCII_WS_RE),
            "alternate",
        )
    ).select(
        "url",
        F.col("pre_ord").alias("l_ord"),
        kind.alias("feed_type"),
        a["href"].alias("href"),
        a["title"].alias("title"),
    ).where(F.col("feed_type").isNotNull())
    w = Window.partitionBy("url").orderBy("l_ord")
    return links.select(
        "url",
        F.row_number().over(w).cast("long").alias("feed_pos"),
        "feed_type",
        "href",
        resolve_href(F.col("url"), F.col("href")).alias("resolved"),
        "title",
    )
