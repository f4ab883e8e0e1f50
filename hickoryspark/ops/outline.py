"""Heading outline extraction — section paths for document chunking.

Long-document pipelines (RAG indexing, section-aware training chunks)
label every passage with its enclosing section titles. This operator
turns each page's ``h1``–``h6`` elements into outline rows carrying
the nearest enclosing h1/h2 section context, computed with proper
stack semantics: an ``h2`` opened under a *previous* ``h1`` does not
leak into the next ``h1``'s subtree.

Pure JVM single-shuffle program over the node table: heading text
rows (text nodes whose parent is a heading — the DIRECT-children
notion every other text field here uses; markup-nested heading text
is out of scope and documented) aggregate per heading element, then
one url window evaluates all the last-seen-level expressions.

Semantics (fixed so oracles can reproduce them):

- One row per heading element that has at least one direct text
  child; ``text`` concatenates those children in document order,
  whitespace as written.
- ``heading_pos``: 1-based document order among the page's emitted
  headings; ``level``: 1–6 from the tag name.
- ``h1_section``: text of the nearest heading of level 1 at-or-before
  this one (itself when level == 1); NULL when none yet.
- ``h2_section``: NULL when level < 2; else the nearest level-2 text
  at-or-before, but only if it appeared AFTER the current h1 section
  opened (stack rule above); itself when level == 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

OUTLINE_COLS = [
    "url", "heading_pos", "level", "text", "h1_section", "h2_section",
]

_HEADING_TAGS = ["h1", "h2", "h3", "h4", "h5", "h6"]


def heading_outline(nodes: DataFrame) -> DataFrame:
    """node table → outline rows (OUTLINE_COLS); one url shuffle."""
    texts = nodes.where(
        (F.col("type") == TYPE_TEXT)
        & (F.col("parent_type") == TYPE_ELEMENT)
        & F.col("parent_tag").isin(_HEADING_TAGS)
    ).select(
        "url",
        F.col("parent_id").alias("h_id"),
        F.substring("parent_tag", 2, 1).cast("int").alias("level"),
        "pre_ord",
        "text",
    )
    heads = texts.groupBy("url", "h_id", "level").agg(
        F.min("pre_ord").alias("ord"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pre_ord", "text"))),
                lambda s: s["text"],
            ),
            "",
        ).alias("text"),
    )
    w = (
        Window.partitionBy("url")
        .orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def last_of(level: int, col: str):
        return F.last(
            F.when(F.col("level") == level, F.col(col)), ignorenulls=True
        ).over(w)

    h1_txt, h1_ord = last_of(1, "text"), last_of(1, "ord")
    h2_txt, h2_ord = last_of(2, "text"), last_of(2, "ord")
    return heads.select(
        "url",
        F.row_number().over(Window.partitionBy("url").orderBy("ord"))
        .cast("long").alias("heading_pos"),
        "level",
        "text",
        h1_txt.alias("h1_section"),
        F.when(
            (F.col("level") >= 2)
            & (h2_ord > F.coalesce(h1_ord, F.lit(-1))),
            h2_txt,
        ).alias("h2_section"),
    )
