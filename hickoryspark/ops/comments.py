"""Comment-section detection — the id/class-marker heuristic every
article extractor (Readability, boilerpipe derivatives) uses to strip
user-comment threads before the main text is taken.

Pinned semantics (the gate oracle reproduces them):

- a MARKER element has an ``id`` that case-folds to one of
  ``MARKER_TOKENS``, or a ``class`` containing one of them as an
  ASCII-whitespace-delimited token (exact token match — ``commentary``
  never matches ``comment``);
- ``n_markers`` counts ALL marker elements on the page (nested
  markers each count);
- ``comment_chars`` sums ``length(text)`` over text nodes inside AT
  LEAST ONE marker subtree — counted once even under nested markers
  (interval SEMI join, so coverage never double-counts);
- ``total_chars`` sums over all the page's text nodes;
- ``comment_share_milli = (1000 * comment_chars) div
  greatest(total_chars, 1)``;
- one row per page present in the node table, zeros when no markers.

Spark shape: one url-equi interval semi-join + three per-url rollups
joined on url — a single url shuffle family, pure JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT
from hickoryspark.ops.metadata import ASCII_WS_RE

__all__ = ["comment_sections", "MARKER_TOKENS"]

#: the classic comment-thread container markers
MARKER_TOKENS = [
    "comment", "comments", "comment-list", "comment-section",
    "disqus_thread", "respond",
]


def comment_sections(nodes: DataFrame) -> DataFrame:
    """Node table -> ``(url, n_markers, comment_chars, total_chars,
    comment_share_milli)``, one row per page."""
    is_elem = F.col("type") == TYPE_ELEMENT
    markers_set = F.array(*[F.lit(t) for t in MARKER_TOKENS])

    id_hit = F.array_contains(
        markers_set, F.lower(F.coalesce(F.col("attrs")["id"], F.lit(""))))
    class_toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("attrs")["class"], F.lit(""))),
                ASCII_WS_RE),
        lambda t: t != "",
    )
    class_hit = F.exists(class_toks,
                         lambda t: F.array_contains(markers_set, t))

    markers = nodes.where(is_elem & (id_hit | class_hit)).select(
        F.col("url").alias("m_url"), F.col("pre_ord").alias("m_pre"),
        F.col("subtree_end").alias("m_end"),
    )
    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        "url", "pre_ord", F.length("text").cast("long").alias("chars"))

    per_page = texts.groupBy("url").agg(
        F.sum("chars").alias("total_chars"))
    n_markers = markers.groupBy(F.col("m_url").alias("url")).agg(
        F.count(F.lit(1)).cast("long").alias("n_markers"))
    covered = texts.join(
        markers,
        (texts["url"] == markers["m_url"])
        & (texts["pre_ord"] > markers["m_pre"])
        & (texts["pre_ord"] <= markers["m_end"]),
        "left_semi",
    ).groupBy("url").agg(F.sum("chars").alias("comment_chars"))

    pages = nodes.select("url").distinct()
    return (
        pages.join(per_page, "url", "left")
        .join(n_markers, "url", "left")
        .join(covered, "url", "left")
        .select(
            "url",
            F.coalesce("n_markers", F.lit(0)).cast("long")
            .alias("n_markers"),
            F.coalesce("comment_chars", F.lit(0)).cast("long")
            .alias("comment_chars"),
            F.coalesce("total_chars", F.lit(0)).cast("long")
            .alias("total_chars"),
        )
        .withColumn(
            "comment_share_milli",
            F.expr("(1000 * comment_chars)"
                   " div greatest(total_chars, 1)").cast("long"),
        )
    )
