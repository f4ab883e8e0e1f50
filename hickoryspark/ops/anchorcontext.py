"""Anchor context windows — the entity-linking / anchor-text-mining
primitive (GERBIL-style linkers and anchor-based query mining both
consume the text immediately around each link, not just the anchor
string itself).

For every ``<a href>`` with direct text, emit the ``k`` chars of
page text before and after the anchor's span:
``(url, link_pos, href, anchor, before, after)``.

Pinned rules:

- page text = concatenation of ALL text nodes in document order (the
  same linearization the extract engine renders);
- the anchor SPAN runs from the first to the last DIRECT text child
  of the ``<a>`` (the link_graph anchor rule) — markup nested inside
  the anchor contributes to the page text (and hence can appear
  inside the span) but not to the ``anchor`` string;
- anchors with no direct text emit no row;
- ``before`` is the up-to-``k`` chars ending at the span start,
  ``after`` the up-to-``k`` chars from the span end.

Scale shape: one url-partition window computes the running text
offsets; the page-text aggregate, the per-anchor span aggregate, and
the anchor-element join are all url-grain — page bodies shuffle once
into the url partitioning and stay there (AQE co-locates the
equi-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

__all__ = ["anchor_contexts", "DEFAULT_CONTEXT_CHARS"]

DEFAULT_CONTEXT_CHARS = 40


def anchor_contexts(nodes: DataFrame,
                    k: int = DEFAULT_CONTEXT_CHARS) -> DataFrame:
    """Node table -> per-anchor context rows (see module doc)."""
    k = int(k)
    texts = (
        nodes.where(F.col("type") == TYPE_TEXT)
        .select("url", "pre_ord", "parent_id", "parent_tag",
                "parent_type", "text")
        .repartition("url"))
    wt = (Window.partitionBy("url").orderBy("pre_ord")
          .rowsBetween(Window.unboundedPreceding, 0))
    texts = texts.withColumn(
        "t_end", F.sum(F.length("text")).over(wt).cast("long"))
    texts = texts.withColumn(
        "t_start", (F.col("t_end") - F.length("text")).cast("long"))

    page = texts.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct("pre_ord", "text"))),
                lambda s: s["text"]),
            "").alias("page_text"))

    direct = texts.where(
        (F.col("parent_type") == TYPE_ELEMENT)
        & (F.col("parent_tag") == "a"))
    spans = direct.groupBy("url", "parent_id").agg(
        F.min("t_start").cast("long").alias("a_start"),
        F.max("t_end").cast("long").alias("a_end"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct("pre_ord", "text"))),
                lambda s: s["text"]),
            "").alias("anchor"))

    a = F.col("attrs")
    anchors = (
        nodes.where(
            (F.col("type") == TYPE_ELEMENT) & (F.col("tag") == "a")
            & a["href"].isNotNull())
        .select("url", F.col("node_id").alias("parent_id"),
                "pre_ord", a["href"].alias("href")))

    j = (anchors.join(spans, ["url", "parent_id"])
         .join(page, "url"))
    wp = Window.partitionBy("url").orderBy("pre_ord")
    before = F.substring(
        F.col("page_text"),
        (F.greatest(F.lit(0), F.col("a_start") - k) + 1).cast("int"),
        F.least(F.lit(k), F.col("a_start")).cast("int"))
    after = F.substring(
        F.col("page_text"), (F.col("a_end") + 1).cast("int"), k)
    return j.select(
        "url",
        F.row_number().over(wp).cast("long").alias("link_pos"),
        "href", "anchor",
        before.alias("before"), after.alias("after"))
