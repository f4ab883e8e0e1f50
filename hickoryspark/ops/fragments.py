"""Fragment-link audit — intra-page ``#fragment`` anchors resolved
against the page's own ``id`` attributes.

Footnote/TOC mining and link-integrity audits both reduce to this:
which ``<a href="#...">`` anchors actually land on an element, and
what element is it (a ``#fn1`` pointing at an ``<li>`` is a footnote;
a ``#section-2`` pointing at an ``<h2>`` is a TOC entry; a miss is a
broken anchor).

Pinned semantics (the gate oracle reproduces them):

- a FRAGMENT LINK is an ``a`` element whose ``href`` starts with
  ``#``; ``fragment`` is everything after the ``#`` as written (no
  decoding); ``frag_pos`` is its 1-based document order among the
  page's fragment links;
- the TARGET is the first-in-document-order element on the SAME page
  whose ``id`` attribute equals the fragment exactly (case-sensitive,
  the DOM getElementById rule); ``target_exists`` is 1/0,
  ``target_tag`` the target's tag (NULL on miss);
- a bare ``#`` (empty fragment) is kept and never matches (HTML's
  scroll-to-top idiom — ids are non-empty by the time the tree
  builder stores them, and the pinned rule is simply: no id equals
  '').

Spark shape: one url-local groupBy for first-id-wins, one url-equi
left join — a single url shuffle family, pure JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT

__all__ = ["fragment_links"]


def fragment_links(nodes: DataFrame) -> DataFrame:
    """Node table -> ``(url, frag_pos, fragment, target_exists,
    target_tag)``."""
    is_elem = F.col("type") == TYPE_ELEMENT

    frags = nodes.where(
        is_elem & (F.col("tag") == "a")
        & F.col("attrs")["href"].startswith("#")
    ).select(
        "url", F.col("pre_ord").alias("a_ord"),
        F.expr("substring(attrs['href'], 2)").alias("fragment"),
    ).withColumn(
        "frag_pos",
        F.row_number().over(
            Window.partitionBy("url").orderBy("a_ord")).cast("long"),
    )

    ids = nodes.where(
        is_elem & F.col("attrs")["id"].isNotNull()
    ).select(
        F.col("url").alias("i_url"),
        F.col("attrs")["id"].alias("id"),
        "pre_ord", "tag",
    ).groupBy("i_url", "id").agg(
        F.min_by("tag", "pre_ord").alias("target_tag"))

    return (
        frags.join(
            ids,
            (frags["url"] == ids["i_url"])
            & (frags["fragment"] == ids["id"]),
            "left",
        )
        .select(
            "url", "frag_pos", "fragment",
            F.col("target_tag").isNotNull().cast("long")
            .alias("target_exists"),
            "target_tag",
        )
    )
