"""Sitemap (sitemaps.org XML) parsing — the discovery-side companion
to robots.txt admission (ops/robots.py) and the link graph
(ops/links.py): a crawl seeds its frontier from sitemap URL sets.

Supported per the sitemaps.org protocol:
- ``<urlset>`` documents: one row per ``<url>`` entry with ``loc``
  (required; entries without a loc are dropped), ``lastmod``,
  ``changefreq``, ``priority`` (optional, NULL when absent);
- ``<sitemapindex>`` documents: one row per child ``<sitemap>`` with
  its ``loc``, flagged ``is_index=true`` so the caller can schedule
  the child fetches (this module parses bytes it is given; it does
  not fetch);
- both plain and gzip-compressed payloads (sitemap.xml.gz).

The parser is a strict regex scan over the two fixed element shapes —
sitemap XML is machine-generated and flat, so a DOM parser buys
nothing — with entity unescaping for the five XML built-ins (the
sitemaps.org spec requires escaped URLs). Spark surface: one
``mapInPandas`` over (host, payload) rows, schema
(host, is_index, loc, lastmod, changefreq, priority, entry_pos).
"""

from __future__ import annotations

import gzip
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

SITEMAP_SCHEMA = (
    "host string, is_index boolean, loc string, lastmod string, "
    "changefreq string, priority double, entry_pos long"
)

_ENTRY_RE = re.compile(
    r"<(url|sitemap)\b[^>]*>(.*?)</\1>", re.S | re.I
)
_FIELD_RES = {
    name: re.compile(rf"<{name}\b[^>]*>\s*(.*?)\s*</{name}>", re.S | re.I)
    for name in ("loc", "lastmod", "changefreq", "priority")
}
_UNESCAPE = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'",
}
# named built-ins plus numeric character references (&#47; / &#x2F;) —
# both are valid XML and common sitemap-generator output
_ENT_RE = re.compile(
    "|".join(_UNESCAPE) + r"|&#[xX][0-9a-fA-F]{1,6};|&#[0-9]{1,7};"
)


def _decode_entity(m: re.Match) -> str:
    ent = m.group(0)
    named = _UNESCAPE.get(ent)
    if named is not None:
        return named
    body = ent[2:-1]
    try:
        cp = int(body[1:], 16) if body[:1] in ("x", "X") else int(body)
        if 0xD800 <= cp <= 0xDFFF:
            # XML prohibits surrogate character references; chr() would
            # produce a lone surrogate that Arrow serialization later
            # rejects ('surrogates not allowed'), letting one hostile
            # sitemap kill the task — leave the entity as written
            return ent
        return chr(cp)
    except (ValueError, OverflowError):
        return ent  # out-of-range reference: leave as written


def _unescape(s: str) -> str:
    return _ENT_RE.sub(_decode_entity, s)


def parse_sitemap(payload: bytes) -> list[dict]:
    """Sitemap bytes (plain or gzip) -> entry dicts in document order:
    {is_index, loc, lastmod, changefreq, priority, entry_pos}."""
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError, zlib.error):
            # truncated header/trailer raises OSError/EOFError but a
            # corrupt DEFLATE body raises zlib.error — catch all three
            # or one hostile archive still kills the task
            return []
    text = payload.decode("utf-8", "replace")
    out = []
    for m in _ENTRY_RE.finditer(text):
        kind, body = m.group(1).lower(), m.group(2)
        fields = {}
        for name, rx in _FIELD_RES.items():
            fm = rx.search(body)
            fields[name] = _unescape(fm.group(1)) if fm else None
        if not fields["loc"]:
            continue  # loc is mandatory per the protocol
        try:
            prio = (
                float(fields["priority"])
                if fields["priority"] is not None
                else None
            )
        except ValueError:
            prio = None
        out.append(
            {
                "is_index": kind == "sitemap",
                "loc": fields["loc"],
                "lastmod": fields["lastmod"],
                "changefreq": fields["changefreq"],
                "priority": prio,
                "entry_pos": len(out) + 1,
            }
        )
    return out


def parse_sitemaps_df(sitemaps: DataFrame) -> DataFrame:
    """sitemaps(host, payload binary) -> exploded entry rows
    (SITEMAP_SCHEMA). One archive row parses inside one task; the
    explode is row-local, so parallelism = input partitioning."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows: dict[str, list] = {
                "host": [], "is_index": [], "loc": [], "lastmod": [],
                "changefreq": [], "priority": [], "entry_pos": [],
            }
            for host, payload in zip(b["host"], b["payload"]):
                if payload is None:
                    continue  # failed fetch: degrade, never fail
                for e in parse_sitemap(bytes(payload)):
                    rows["host"].append(host)
                    for k in ("is_index", "loc", "lastmod", "changefreq",
                              "priority", "entry_pos"):
                        rows[k].append(e[k])
            yield pd.DataFrame(rows)

    return sitemaps.select("host", "payload").mapInPandas(
        gen, SITEMAP_SCHEMA
    )
