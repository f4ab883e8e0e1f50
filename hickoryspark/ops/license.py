"""License detection — ``rel="license"`` links and CC URL parsing.

Open-data curation (C4's terms-of-use filtering, LAION's license
columns) keys on the page-declared license: the HTML way to declare
one is a ``rel="license"`` token on an ``<a>`` or ``<link>`` element
(RFC 4946 / HTML spec link type), almost always pointing at a
creativecommons.org URL. This op extracts those edges relationally
and parses the CC identifier out of the href. The reference engine
has no equivalent; same net-new surface class as ops/links.py.

Pinned semantics (oracle-reproducible):

- an element qualifies when it is ``<a>`` or ``<link>``, has an
  ``href``, and its ``rel`` token list (ASCII-whitespace split,
  case-insensitive — the ops/metadata token rule) contains
  ``license``;
- ``license_id``/``license_version`` parse from the href (scheme
  http/https, optional ``www.``, case-insensitive):
  ``creativecommons.org/licenses/<code>/<ver>...`` → ``cc-<code>``,
  ``creativecommons.org/publicdomain/zero/<ver>`` → ``cc0``,
  ``creativecommons.org/publicdomain/mark/<ver>`` → ``pdm``;
  anything else keeps the row with NULL id/version (a declared but
  unrecognized license is a signal too — the curator decides);
- ``page_license`` rolls up to one row per url: the FIRST declared
  license in document order, preferring nothing else (no "recognized
  beats unrecognized" — first-in-doc is the author's declaration).

Scale shape: ``detect_licenses`` is one filtered scan + one url
window shuffle; ``page_license`` is one map-side-combinable min-
struct groupBy (no window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT
from hickoryspark.ops.metadata import ASCII_WS_RE

__all__ = ["detect_licenses", "page_license", "CC_HREF_RE"]

#: group 1 = licenses/<code>, group 2 = its version,
#: group 3 = zero|mark, group 4 = its version
CC_HREF_RE = (
    r"(?i)^https?://(?:www\.)?creativecommons\.org/"
    r"(?:licenses/([a-z+\-]+)/([0-9]+\.[0-9]+)"
    r"|publicdomain/(zero|mark)/([0-9]+\.[0-9]+))"
)


def _license_cols(href):
    code = F.lower(F.regexp_extract(href, CC_HREF_RE, 1))
    ver_l = F.regexp_extract(href, CC_HREF_RE, 2)
    pd_kind = F.lower(F.regexp_extract(href, CC_HREF_RE, 3))
    ver_pd = F.regexp_extract(href, CC_HREF_RE, 4)
    license_id = (
        F.when(code != "", F.concat(F.lit("cc-"), code))
        .when(pd_kind == "zero", F.lit("cc0"))
        .when(pd_kind == "mark", F.lit("pdm"))
    )
    version = F.when(code != "", ver_l).when(pd_kind != "", ver_pd)
    return license_id, version


def detect_licenses(nodes: DataFrame) -> DataFrame:
    """Node table -> one row per rel=license element:
    (url, lic_pos, tag, href, license_id, license_version)."""
    rel_tokens = F.split(
        F.lower(F.coalesce(F.col("attrs")["rel"], F.lit(""))),
        ASCII_WS_RE,
    )
    cand = nodes.where(
        (F.col("type") == TYPE_ELEMENT)
        & F.col("tag").isin("a", "link")
        & F.col("attrs")["href"].isNotNull()
        & F.array_contains(rel_tokens, "license")
    ).select(
        "url",
        F.col("pre_ord").alias("_ord"),
        "tag",
        F.col("attrs")["href"].alias("href"),
    )
    license_id, version = _license_cols(F.col("href"))
    w = Window.partitionBy("url").orderBy("_ord")
    return cand.select(
        "url",
        F.row_number().over(w).cast("long").alias("lic_pos"),
        "tag",
        "href",
        license_id.alias("license_id"),
        version.alias("license_version"),
    )


def page_license(nodes: DataFrame) -> DataFrame:
    """One row per url that declares any license: the FIRST
    declaration in document order — (url, href, license_id,
    license_version). Map-side-combinable min-struct, no window."""
    rel_tokens = F.split(
        F.lower(F.coalesce(F.col("attrs")["rel"], F.lit(""))),
        ASCII_WS_RE,
    )
    cand = nodes.where(
        (F.col("type") == TYPE_ELEMENT)
        & F.col("tag").isin("a", "link")
        & F.col("attrs")["href"].isNotNull()
        & F.array_contains(rel_tokens, "license")
    ).select(
        "url",
        F.struct(F.col("pre_ord"), F.col("attrs")["href"].alias("href"))
        .alias("_first"),
    )
    first = cand.groupBy("url").agg(F.min("_first")["href"].alias("href"))
    license_id, version = _license_cols(F.col("href"))
    return first.select(
        "url",
        "href",
        license_id.alias("license_id"),
        version.alias("license_version"),
    )
