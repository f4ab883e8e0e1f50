"""MathML extraction — ``<math>`` islands as rows, linearized.

Math-corpus mining (equation retrieval, math-aware LLM data) wants
every MathML island with its display mode and content linearization.
The WHATWG foreign-content parse path (html/treebuilder.py) already
builds these subtrees; this operator lifts them out of the node
table.

Pinned semantics (the gate oracle reproduces them):

- one row per ``math`` element; ``math_pos`` is its 1-based document
  order among the page's math elements (nested islands each get
  their own row, the ops/quotes.py rule);
- ``display`` is ``'block'`` when the element's ``display`` attribute
  case-folds to ``block``, else ``'inline'`` (the MathML default);
- ``alttext`` is the ``alttext`` attribute as written (NULL when
  absent);
- ``text`` concatenates the island's descendant text nodes in
  document order, EXCLUDING text inside ``annotation`` /
  ``annotation-xml`` descendants of THIS island (those carry
  alternate encodings — TeX, content MathML — not presentation
  content; an annotation that is an ANCESTOR of a nested island does
  not suppress the nested island's own row), ASCII-trimmed.

Spark shape: url-equi interval joins only (math->text ownership, then
an annotation-interval anti-filter on the owned pairs) — one url
shuffle family, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

__all__ = ["extract_math"]

_TRIM = "btrim({c}, ' \\t\\n\\r')"


def extract_math(nodes: DataFrame) -> DataFrame:
    """Node table -> ``(url, math_pos, display, alttext, text)``."""
    is_elem = F.col("type") == TYPE_ELEMENT

    maths = nodes.where(is_elem & (F.col("tag") == "math")).select(
        "url", F.col("pre_ord").alias("m_pre"),
        F.col("subtree_end").alias("m_end"),
        F.when(F.lower(F.col("attrs")["display"]) == "block",
               F.lit("block")).otherwise(F.lit("inline"))
        .alias("display"),
        F.col("attrs")["alttext"].alias("alttext"),
    ).withColumn(
        "math_pos",
        F.row_number().over(
            Window.partitionBy("url").orderBy("m_pre")).cast("long"),
    )

    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        F.col("url").alias("t_url"), F.col("pre_ord").alias("t_ord"),
        "text")
    anns = nodes.where(
        is_elem & F.col("tag").isin("annotation", "annotation-xml")
    ).select(
        F.col("url").alias("a_url"), F.col("pre_ord").alias("a_pre"),
        F.col("subtree_end").alias("a_end"),
    )

    owned = maths.join(
        texts,
        (maths["url"] == texts["t_url"])
        & (texts["t_ord"] > maths["m_pre"])
        & (texts["t_ord"] <= maths["m_end"]),
        "left",
    ).select("url", "math_pos", "display", "alttext", "m_pre", "m_end",
             "t_ord", "text")

    # NULL out (don't filter) pairs whose text sits inside an
    # annotation that is a DESCENDANT of this island (a_pre strictly
    # inside (m_pre, m_end]): a WHERE would delete an island whose
    # only text is annotation content, but it must still emit a row
    # with text ''. An excluded pair matched by k nested annotations
    # duplicates into k rows — all NULL contributions, so the
    # NULL-skipping collect_list makes the duplication harmless; kept
    # texts match zero annotations and stay single rows.
    paired = owned.join(
        anns,
        (owned["url"] == anns["a_url"])
        & (anns["a_pre"] > owned["m_pre"])
        & (anns["a_pre"] <= owned["m_end"])
        & (owned["t_ord"] > anns["a_pre"])
        & (owned["t_ord"] <= anns["a_end"]),
        "left",
    )

    kept_concat = (
        "array_join(transform(array_sort(collect_list("
        "CASE WHEN a_pre IS NULL THEN struct(t_ord, text) END)),"
        " s -> s.text), '')"
    )
    return (
        paired.repartition("url")
        .groupBy("url", "math_pos", "display", "alttext", "m_pre")
        .agg(F.expr(_TRIM.format(c=kept_concat)).alias("text"))
        .select("url", "math_pos", "display", "alttext", "text")
    )
