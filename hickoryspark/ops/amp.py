"""AMP page pairing — the ``rel=amphtml`` / ``rel=canonical``
bidirectional link a mobile-results crawler follows, and a dedup
signal (an AMP page is a near-copy of its canonical; a corpus keeps
one).

Pinned semantics (oracle-reproducible):

- ``is_amp``: the page's ``<html>`` element carries an ``amp`` or
  ``⚡`` attribute (presence test — both markers are valid per the
  AMP HTML spec);
- one output row per (page, kind) for kind ∈ {``amphtml``,
  ``canonical``}: the FIRST document-order ``<link>`` whose ``rel``
  token list (ASCII-whitespace split, case-insensitive — the
  ops/metadata.py rule) contains the kind and which carries ``href``;
  a single ``rel="amphtml canonical"`` link emits BOTH rows;
- ``target`` = the href resolved against the page url
  (ops/urls.resolve_href); pages with neither link emit no rows
  (``is_amp``-only pages are invisible here — pair discovery needs
  an edge).

Output: ``(url, is_amp, kind, target)``.

Spark shape: kinds are emitted as ROWS (posexplode of the matched
kind array), so resolve_href's regex program appears in exactly ONE
column of one projection (the codegen-limit rule from CLAUDE.md);
first-per-kind is a min-struct groupBy; the ``is_amp`` flag rides a
tiny per-page aggregate equi-joined back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT
from hickoryspark.ops.metadata import ASCII_WS_RE
from hickoryspark.ops.links import resolve_href

AMP_LINK_KINDS = ("amphtml", "canonical")


def amp_links(nodes: DataFrame) -> DataFrame:
    """AMP/canonical pairing rows over a node table (see module
    docstring)."""
    elems = nodes.where(F.col("type") == TYPE_ELEMENT)
    a = F.col("attrs")
    rel_toks = F.transform(
        F.split(F.coalesce(a["rel"], F.lit("")), ASCII_WS_RE),
        lambda t: F.lower(t),
    )
    kinds = F.filter(
        F.array(*[F.lit(k) for k in AMP_LINK_KINDS]),
        lambda k: F.array_contains(rel_toks, k),
    )
    links = (
        elems.where(
            (F.col("tag") == "link")
            & a["href"].isNotNull()
            & (F.size(kinds) > 0)
        )
        .select(
            "url",
            F.col("pre_ord").alias("l_ord"),
            a["href"].alias("href"),
            F.explode(kinds).alias("kind"),
        )
        .groupBy("url", "kind")
        .agg(
            F.min(F.struct(F.col("l_ord"), F.col("href")))["href"]
            .alias("_href")
        )
    )
    amp_flags = (
        elems.where(
            (F.col("tag") == "html")
            & (a["amp"].isNotNull() | a["⚡"].isNotNull())
        )
        .select("url")
        .distinct()
        .withColumn("_amp", F.lit(1))
    )
    return (
        links.join(amp_flags, "url", "left")
        .select(
            "url",
            F.coalesce(F.col("_amp"), F.lit(0)).cast("int")
            .alias("is_amp"),
            "kind",
            resolve_href(F.col("url"), F.col("_href")).alias("target"),
        )
    )
