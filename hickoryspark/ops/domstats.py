"""DOM shape statistics — per-page structural profile (node/element
counts, tree depth, visible-text volume, script volume). The router
signal for render-queue decisions (a JS-heavy shell page needs a
headless render before extraction) and a cheap template-drift monitor.

Pinned semantics (the gate oracle reproduces them):

- ``n_nodes`` counts EVERY node-table row (document, elements, text,
  comments, comment-payload strings); ``n_elements`` the element rows;
- ``max_depth`` is the maximum ``depth`` (document = 0);
- ``n_text`` / ``text_chars`` count/measure the text nodes whose
  parent is an element OTHER than ``script``/``style`` (comment
  payload strings have a non-element parent and are excluded;
  script/style rawtext is code, not prose);
- ``script_chars`` measures text under ``script``/``style`` parents;
- ``js_heavy_milli`` = ``1000 * script_chars div (script_chars +
  text_chars)`` (0 when the page has no text at all).

Spark shape: ONE url groupBy over the node table — no joins, no
windows; conditional aggregation does everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

__all__ = ["dom_stats"]


def dom_stats(nodes: DataFrame) -> DataFrame:
    """Node table -> one row per page: ``(url, n_nodes, n_elements,
    max_depth, n_text, text_chars, script_chars, js_heavy_milli)``."""
    is_text = F.col("type") == TYPE_TEXT
    par_elem = F.col("parent_type") == TYPE_ELEMENT
    par_code = F.col("parent_tag").isin("script", "style")
    prose = is_text & par_elem & ~par_code
    code = is_text & par_elem & par_code
    tlen = F.length(F.coalesce(F.col("text"), F.lit("")))

    agg = nodes.groupBy("url").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum((F.col("type") == TYPE_ELEMENT).cast("int"))
        .cast("long").alias("n_elements"),
        F.max("depth").cast("long").alias("max_depth"),
        F.sum(prose.cast("int")).cast("long").alias("n_text"),
        F.sum(F.when(prose, tlen).otherwise(0)).cast("long")
        .alias("text_chars"),
        F.sum(F.when(code, tlen).otherwise(0)).cast("long")
        .alias("script_chars"),
    )
    return agg.withColumn(
        "js_heavy_milli",
        F.when(
            F.col("script_chars") + F.col("text_chars") == 0, F.lit(0)
        ).otherwise(
            F.expr("(1000 * script_chars) div (script_chars + text_chars)")
        ).cast("long"),
    )
