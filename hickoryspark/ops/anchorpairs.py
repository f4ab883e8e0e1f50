"""Anchor-text ↔ target-title pair mining — (query, document) style
training pairs for retrieval models, harvested from the link graph:
the anchor's subtree text is a human-written query for the page it
points at; the target's ``<title>`` is the document-side label.

Composition of three real operators — ops/links.extract_links
(subtree anchor text), ops/urls.normalize_url (the join key on both
sides), ops/metadata.page_metadata (head-scoped titles) — so
host/canonicalization mismatches between them surface here, the
same reasoning as the crawl_frontier gate.

Pinned semantics:

- one row per anchor OCCURRENCE (``link_pos`` keeps multiplicity —
  duplicate anchors are a real frequency signal pair-mining recipes
  weight by) whose ASCII-trimmed subtree text is non-empty;
- the join key is ``normalize_url(resolved href)`` =
  ``normalize_url(target page url)``; targets without a crawled page
  (or whose page has a NULL or empty title — page_metadata emits ''
  for a titleless page) yield no row;
- ``anchor_text`` is emitted ASCII-trimmed; ``title`` exactly as
  page_metadata produced it.

Codegen note: the target key composes normalize∘resolve ONCE per
output column (the ops/metadata.canonical_targets stance) — the
stage runs interpreted past the 64 KB cliff, documented and correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anchor_title_pairs"]

_TRIM = "btrim(anchor_text, ' \\t\\n\\r')"


def anchor_title_pairs(nodes: DataFrame) -> DataFrame:
    """Node table -> ``(source_url, link_pos, target_url,
    anchor_text, title)``."""
    from hickoryspark.ops.links import extract_links
    from hickoryspark.ops.metadata import page_metadata
    from hickoryspark.ops.urls import normalize_url

    edges = extract_links(nodes, subtree_text=True).select(
        F.col("url").alias("source_url"),
        "link_pos",
        normalize_url(F.col("resolved")).alias("target_key"),
        F.expr(_TRIM).alias("anchor_text"),
    ).where(F.col("anchor_text") != "")

    titles = page_metadata(nodes).where(
        F.col("title").isNotNull() & (F.col("title") != "")
    ).select(
        normalize_url(F.col("url")).alias("target_key"),
        F.col("url").alias("target_url"),
        "title",
    )

    return edges.join(titles, "target_key").select(
        "source_url", "link_pos", "target_url", "anchor_text", "title")
