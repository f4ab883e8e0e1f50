"""FAQ / Q&A pair mining — question headings paired with the prose
that follows them, the standard recipe for turning FAQ and help pages
into instruction-tuning pairs (question -> answer).

Complementary to ops/outline.py's ``heading_outline`` (section paths,
direct-text-only) and ops/kvpairs.py (dl/dt/dd): here the QUESTION is
a heading whose SUBTREE text ends with ``?``, and the ANSWER is all
text between that heading and the next heading of any level.

Pinned semantics (the gate oracle reproduces them):

- a QUESTION is an ``h1``-``h6`` element whose subtree text (all
  descendant text nodes in document order, comment data included —
  the links.py rule), ASCII-trimmed, is non-empty and ends with
  ``?``;
- ``q_pos`` is the 1-based document-order position among the page's
  QUESTION headings (non-question headings don't count);
- ``answer`` is the concat of text nodes strictly after the
  question's ``subtree_end`` and strictly before the next
  ``h1``-``h6`` element's ``pre_ord`` (question or not — any heading
  closes the answer span; end of document otherwise), ASCII-trimmed;
  a question with no text in range yields ``''`` (kept — the empty
  answer is a signal FAQ distillation pipelines filter on).

Spark shape: one url-equi interval-join family over the node table —
headings window (lead) + two text interval joins, all sharing the url
shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

__all__ = ["faq_pairs"]

_HEADING_TAGS = ["h1", "h2", "h3", "h4", "h5", "h6"]

_CONCAT = (
    "array_join(transform(array_sort(collect_list("
    "struct(t_ord, text))), s -> s.text), '')"
)
_TRIM = "btrim({c}, ' \\t\\n\\r')"


def faq_pairs(nodes: DataFrame) -> DataFrame:
    """Node table -> ``(url, q_pos, tag, question, answer)``."""
    is_elem = F.col("type") == TYPE_ELEMENT

    heads = nodes.where(
        is_elem & F.col("tag").isin(_HEADING_TAGS)
    ).select(
        "url", "tag",
        F.col("pre_ord").alias("h_pre"),
        F.col("subtree_end").alias("h_end"),
    ).withColumn(
        # pre_ord of the NEXT heading (any level) on the page; the
        # answer span of a question heading ends there.
        "nxt",
        F.lead("h_pre").over(Window.partitionBy("url").orderBy("h_pre")),
    )

    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        F.col("url").alias("t_url"), F.col("pre_ord").alias("t_ord"),
        "text")

    # subtree text per heading -> keep only '?'-terminated questions
    q_text = (
        heads.join(
            texts,
            (heads["url"] == texts["t_url"])
            & (texts["t_ord"] > heads["h_pre"])
            & (texts["t_ord"] <= heads["h_end"]),
            "left",
        )
        .repartition("url")
        .groupBy("url", "tag", "h_pre", "h_end", "nxt")
        .agg(F.expr(_TRIM.format(c=_CONCAT)).alias("question"))
        .where(F.col("question").endswith("?"))
        .withColumn(
            "q_pos",
            F.row_number().over(
                Window.partitionBy("url").orderBy("h_pre")).cast("long"),
        )
    )

    # answer: text strictly after the heading subtree, before the
    # next heading (or end of document)
    answers = (
        q_text.join(
            texts,
            (q_text["url"] == texts["t_url"])
            & (texts["t_ord"] > q_text["h_end"])
            & (q_text["nxt"].isNull() | (texts["t_ord"] < q_text["nxt"])),
            "left",
        )
        .groupBy("url", "q_pos", "tag", "h_pre", "question")
        .agg(F.expr(_TRIM.format(c=_CONCAT)).alias("answer"))
    )

    return answers.select("url", "q_pos", "tag", "question", "answer")
