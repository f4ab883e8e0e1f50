"""Quotation extraction — ``<blockquote>`` / ``<q>`` content with
source attribution (``cite`` attribute, nearest ``<cite>`` element).
Quote-attribution corpora and citation-graph mining read exactly this.

Pinned semantics (the gate oracle reproduces them):

- a QUOTE is a ``blockquote`` or ``q`` element; ``quote_pos`` is its
  1-based document-order position among the page's quotes (both tags
  share one numbering); nested quotes each get their own row;
- ``text`` is the quote's subtree text (all descendant text nodes in
  document order, comment data included — the links.py rule), ASCII-
  trimmed; inner-quote text appears in BOTH the outer and inner rows
  (subtree semantics, documented);
- ``cite_url`` is the ``cite`` attribute as written (NULL when
  absent);
- ``attribution`` is the subtree text of the FIRST ``cite`` element
  inside the quote, ASCII-trimmed (NULL when none).

Spark shape: two url-equi interval joins (text -> quote, cite-element
text -> quote via min-struct) over the node table — one
co-partitioned url shuffle family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

__all__ = ["extract_quotes"]

_TRIM = "btrim({c}, ' \\t\\n\\r')"


def extract_quotes(nodes: DataFrame) -> DataFrame:
    """Node table -> ``(url, quote_pos, tag, text, cite_url,
    attribution)``."""
    is_elem = F.col("type") == TYPE_ELEMENT

    quotes = nodes.where(
        is_elem & F.col("tag").isin("blockquote", "q")
    ).select(
        "url", F.col("pre_ord").alias("q_pre"),
        F.col("subtree_end").alias("q_end"), "tag",
        F.col("attrs")["cite"].alias("cite_url"),
    ).withColumn(
        "quote_pos",
        F.row_number().over(
            Window.partitionBy("url").orderBy("q_pre")).cast("long"),
    )

    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        F.col("url").alias("t_url"), F.col("pre_ord").alias("t_ord"),
        "text")
    q_text = (
        quotes.join(
            texts,
            (quotes["url"] == texts["t_url"])
            & (texts["t_ord"] > quotes["q_pre"])
            & (texts["t_ord"] <= quotes["q_end"]),
            "left",
        )
        .repartition("url")
        .groupBy("url", "q_pre", "q_end", "tag", "cite_url", "quote_pos")
        .agg(
            F.expr(_TRIM.format(
                c="array_join(transform(array_sort(collect_list("
                  "struct(t_ord, text))), s -> s.text), '')"
            )).alias("text")
        )
    )

    # first <cite> element inside each quote, then ITS subtree text
    cites = nodes.where(is_elem & (F.col("tag") == "cite")).select(
        F.col("url").alias("c_url"), F.col("pre_ord").alias("c_pre"),
        F.col("subtree_end").alias("c_end"),
    )
    first_cite = (
        quotes.select("url", "q_pre", "q_end")
        .join(
            cites,
            (F.col("url") == cites["c_url"])
            & (cites["c_pre"] > F.col("q_pre"))
            & (cites["c_pre"] <= F.col("q_end")),
        )
        .groupBy("url", "q_pre")
        .agg(F.min("c_pre").alias("c_pre"), F.min_by("c_end", "c_pre")
             .alias("c_end"))
    )
    cite_text = (
        first_cite.join(
            texts,
            (first_cite["url"] == texts["t_url"])
            & (texts["t_ord"] > first_cite["c_pre"])
            & (texts["t_ord"] <= first_cite["c_end"]),
            "left",
        )
        .groupBy("url", "q_pre")
        .agg(
            F.expr(_TRIM.format(
                c="array_join(transform(array_sort(collect_list("
                  "struct(t_ord, text))), s -> s.text), '')"
            )).alias("attribution")
        )
    )

    return (
        q_text.join(cite_text, ["url", "q_pre"], "left")
        .select("url", "quote_pos", "tag", "text", "cite_url",
                "attribution")
    )
