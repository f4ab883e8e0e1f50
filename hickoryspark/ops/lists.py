"""List-item extraction — ``<ul>/<ol>/<li>`` structure mining (nav
menus, step lists, feature bullets; the list-shaped sibling of the
``<dl>`` carrier in ops/kvpairs.py and the grid carrier in
ops/tables.py).

Pinned semantics (the gate oracle reproduces them):

- a LIST is a ``ul`` or ``ol`` element; ``list_pos`` is its 1-based
  document-order position among the page's lists (both tags share one
  numbering);
- ITEMS are ``li`` elements whose PARENT is a list (a stray ``li``
  outside ul/ol is dropped — the WHATWG content model makes it
  non-conforming, and browsers that render it give it no list
  context);
- ``item_idx`` is the 1-based position among the li siblings of the
  same list (document order);
- ``nest_depth`` counts the li's ul/ol ancestors (1 = top level);
- ``item_text`` concatenates, in document order, the text nodes whose
  NEAREST enclosing li is this li — text inside a nested sub-list
  belongs to the nested items, never double-counted by the outer item
  (comment data strings count as text — the links.py rule); ``''``
  when the item has none;
- ``n_sublists`` counts the ul/ol elements whose nearest enclosing li
  is this li (direct sub-lists of the item, however deeply wrapped in
  non-li markup).

Spark shape: every structural join is a url-equi interval join on the
node table (never a cross join); after one ``repartition("url")`` the
ownership groupBys and the sibling window all run url-local. Output is
one row per li — bounded by the input node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

__all__ = ["extract_list_items", "LIST_TAGS"]

LIST_TAGS = ("ul", "ol")


def _nearest_li_owner(members: DataFrame, lis: DataFrame) -> DataFrame:
    """(url, m_ord, ...) member rows -> (url, li_ord, m_ord, ...) with
    li_ord the pre_ord of the member's nearest enclosing li (rows with
    no li ancestor are dropped)."""
    iv = lis.select(
        F.col("url").alias("i_url"),
        F.col("pre").alias("i_pre"),
        F.col("end").alias("i_end"),
    )
    joined = members.join(
        iv,
        (members["url"] == iv["i_url"])
        & (members["m_ord"] > iv["i_pre"])
        & (members["m_ord"] <= iv["i_end"]),
        "inner",
    )
    # nearest enclosing li = the ancestor with the LARGEST pre_ord
    return (
        joined.groupBy("url", "m_ord", *[
            c for c in members.columns if c not in ("url", "m_ord")
        ])
        .agg(F.max("i_pre").alias("li_ord"))
    )


def extract_list_items(nodes: DataFrame) -> DataFrame:
    """Node table -> ``(url, list_pos, list_tag, item_idx, nest_depth,
    item_text, n_sublists)`` — one row per li inside a ul/ol."""
    is_elem = F.col("type") == TYPE_ELEMENT

    lists = nodes.where(is_elem & F.col("tag").isin(*LIST_TAGS)).select(
        "url", F.col("node_id").alias("list_id"),
        F.col("pre_ord").alias("l_pre"),
        F.col("subtree_end").alias("l_end"),
        F.col("tag").alias("list_tag"),
    )
    w_list = Window.partitionBy("url").orderBy("l_pre")
    lists = lists.withColumn(
        "list_pos", F.row_number().over(w_list).cast("long"))

    lis = nodes.where(
        is_elem & (F.col("tag") == "li")
        & F.col("parent_tag").isin(*LIST_TAGS)
    ).select(
        "url", F.col("node_id").alias("li_id"),
        F.col("pre_ord").alias("pre"),
        F.col("subtree_end").alias("end"),
        F.col("parent_id").alias("owner_list"),
        "sib_pos",
    )

    # nest depth: count ul/ol ancestor intervals containing the li
    li_iv = lis.select("url", F.col("pre").alias("m_ord"))
    depth = (
        li_iv.join(
            lists.select(F.col("url").alias("i_url"), "l_pre", "l_end"),
            (li_iv["url"] == F.col("i_url"))
            & (li_iv["m_ord"] > F.col("l_pre"))
            & (li_iv["m_ord"] <= F.col("l_end")),
        )
        .groupBy("url", "m_ord")
        .agg(F.count("*").cast("long").alias("nest_depth"))
        .withColumnRenamed("m_ord", "pre")
    )

    # item text: nearest-li ownership of text nodes, ordered concat
    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        "url", F.col("pre_ord").alias("m_ord"), "text")
    owned_text = _nearest_li_owner(texts, lis)
    item_text = (
        owned_text.repartition("url")
        .groupBy("url", "li_ord")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m_ord", "text"))),
                    lambda s: s["text"],
                ),
                "",
            ).alias("item_text")
        )
        .withColumnRenamed("li_ord", "pre")
    )

    # sub-list count: nearest-li ownership of ul/ol elements
    sub = _nearest_li_owner(
        lists.select("url", F.col("l_pre").alias("m_ord")), lis)
    n_sub = sub.groupBy("url", "li_ord").agg(
        F.count("*").cast("long").alias("n_sublists")
    ).withColumnRenamed("li_ord", "pre")

    w_item = Window.partitionBy("url", "owner_list").orderBy("sib_pos")
    out = (
        lis.withColumn("item_idx", F.row_number().over(w_item).cast("long"))
        .join(
            lists.select(
                "url", F.col("list_id").alias("owner_list"),
                "list_tag", "list_pos"),
            ["url", "owner_list"],
        )
        .join(depth, ["url", "pre"])
        .join(item_text, ["url", "pre"], "left")
        .join(n_sub, ["url", "pre"], "left")
    )
    return out.select(
        "url", "list_pos", "list_tag", "item_idx", "nest_depth",
        F.coalesce("item_text", F.lit("")).alias("item_text"),
        F.coalesce("n_sublists", F.lit(0).cast("long")).alias("n_sublists"),
    )
