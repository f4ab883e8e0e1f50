"""Dialogue-turn mining — linearize nested comment/reply markup into
conversation-tree rows (the forum-thread extraction step behind
conversational-data pipelines: each turn with its parent, thread
root, and depth, ready to be walked into reply chains).

Pinned markup contract (the common nested-thread shape):

- a TURN is an element whose ``class`` contains the ASCII-ws-
  delimited token ``comment`` (exact token — ``commentary`` never
  matches); replies are turn elements NESTED inside their parent
  turn's subtree;
- ``turn_id`` is the turn's ``pre_ord`` (stable within a page);
  ``parent_id`` the nearest enclosing turn's (NULL for top-level),
  ``root_id`` the outermost enclosing turn's (itself for top-level),
  ``depth`` the number of enclosing turns;
- ``author`` is the turn's own ``data-author`` attribute (NULL when
  absent);
- ``text`` is the document-order concatenation of text nodes whose
  NEAREST enclosing turn is this turn — i.e. a parent's text never
  includes its replies' text (the ownership rule that makes the rows
  usable as individual utterances); each piece is ASCII-ws-trimmed,
  empty pieces (markup indentation) drop, survivors join with a
  single space. A turn owning no text keeps its row with NULL text.

Scale shape: all joins are url-equi with pre_ord/subtree_end interval
residuals (the descendant_rel pattern — never a cross join); per-page
turn counts bound the turn x turn self-join quadratically but pages
are small and the join is url-local. Ancestor stats (depth, parent,
root) and text ownership are each ONE aggregation over their join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT
from hickoryspark.ops.metadata import ASCII_WS_RE

__all__ = ["dialogue_turns", "TURN_CLASS"]

TURN_CLASS = "comment"


def dialogue_turns(nodes: DataFrame) -> DataFrame:
    """Node table -> (url, turn_id, parent_id, root_id, depth,
    author, text); one row per turn element."""
    is_elem = F.col("type") == TYPE_ELEMENT
    class_toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("attrs")["class"], F.lit(""))),
                ASCII_WS_RE),
        lambda t: t != "",
    )
    is_turn = is_elem & F.array_contains(class_toks, F.lit(TURN_CLASS))

    turns = nodes.where(is_turn).select(
        "url",
        F.col("pre_ord").alias("turn_id"),
        F.col("subtree_end").alias("turn_end"),
        F.col("attrs")["data-author"].alias("author"),
    )

    anc = turns.select(
        F.col("url").alias("a_url"),
        F.col("turn_id").alias("a_id"),
        F.col("turn_end").alias("a_end"),
    )
    lineage = (
        turns.join(
            anc,
            (turns["url"] == anc["a_url"])
            & (anc["a_id"] < turns["turn_id"])
            & (turns["turn_id"] <= anc["a_end"]),
            "left",
        )
        .groupBy("url", "turn_id", "author")
        .agg(
            F.count("a_id").cast("long").alias("depth"),
            F.max("a_id").alias("parent_id"),
            F.min("a_id").alias("root_id"),
        )
        .withColumn("root_id", F.coalesce("root_id", F.col("turn_id")))
    )

    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        F.col("url").alias("t_url"),
        F.col("pre_ord").alias("t_ord"),
        F.col("text").alias("t_text"),
    )
    owned = (
        texts.join(
            turns,
            (texts["t_url"] == turns["url"])
            & (texts["t_ord"] > turns["turn_id"])
            & (texts["t_ord"] <= turns["turn_end"]),
        )
        .groupBy("t_url", "t_ord", "t_text")
        .agg(F.max("turn_id").alias("owner_id"))
        .groupBy(F.col("t_url").alias("url"),
                 F.col("owner_id").alias("turn_id"))
        .agg(
            F.array_join(
                F.filter(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("t_ord", "t_text"))
                        ),
                        lambda s: F.btrim(s["t_text"],
                                          F.lit(" \t\n\x0b\f\r")),
                    ),
                    lambda t: t != "",
                ),
                " ",
            ).alias("text")
        )
        .where(F.col("text") != "")
    )

    return (
        lineage.join(owned, ["url", "turn_id"], "left")
        .select(
            "url", "turn_id", "parent_id", "root_id", "depth",
            "author", "text",
        )
    )
