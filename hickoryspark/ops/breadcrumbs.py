"""Breadcrumb-trail extraction — site-hierarchy mining from the DOM
carrier (containers marked ``class~=breadcrumb`` or
``aria-label=breadcrumb``, the pattern virtually every CMS theme
emits). Complements the JSON-LD carrier (ops/structured.py readers
can pull schema.org BreadcrumbList from ``jsonld_extract`` blocks).

Pinned semantics (the gate oracle reproduces them):

- a CONTAINER is any element whose ``class`` attribute, split on
  ASCII whitespace, contains the token ``breadcrumb`` (ASCII
  case-insensitive) OR whose ``aria-label`` equals ``breadcrumb``
  (case-insensitive); ``trail_pos`` is its 1-based document-order
  position among the page's containers;
- CRUMBS are the ``li`` elements whose NEAREST enclosing container is
  that container (document order, 1-based ``crumb_pos``);
- ``text`` is the li's subtree text (all descendant text nodes in
  document order; comment data counts — the links.py rule), trimmed
  of ASCII whitespace;
- ``href`` is the href of the FIRST ``a`` descendant that has one
  (NULL when none — the "you are here" tail crumb).

Spark shape: three url-equi interval joins (li->container,
text->li, a->li) + per-key windows; one co-partitioned url shuffle
family, no cross joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT
from hickoryspark.ops.metadata import ASCII_WS_RE

__all__ = ["extract_breadcrumbs"]


def _is_container() -> F.Column:
    cls = F.coalesce(F.col("attrs")["class"], F.lit(""))
    toks = F.filter(F.split(cls, ASCII_WS_RE), lambda t: t != "")
    has_cls = F.exists(toks, lambda t: F.lower(t) == "breadcrumb")
    aria = F.lower(F.coalesce(F.col("attrs")["aria-label"], F.lit("")))
    return has_cls | (aria == "breadcrumb")


def extract_breadcrumbs(nodes: DataFrame) -> DataFrame:
    """Node table -> ``(url, trail_pos, crumb_pos, text, href)``."""
    is_elem = F.col("type") == TYPE_ELEMENT

    conts = nodes.where(is_elem & _is_container()).select(
        "url", F.col("pre_ord").alias("b_pre"),
        F.col("subtree_end").alias("b_end"),
    ).withColumn(
        "trail_pos",
        F.row_number().over(
            Window.partitionBy("url").orderBy("b_pre")).cast("long"),
    )

    lis = nodes.where(is_elem & (F.col("tag") == "li")).select(
        "url", F.col("pre_ord").alias("l_pre"),
        F.col("subtree_end").alias("l_end"),
    )
    owned = (
        lis.join(
            conts.select(F.col("url").alias("c_url"), "b_pre", "b_end"),
            (lis["url"] == F.col("c_url"))
            & (lis["l_pre"] > F.col("b_pre"))
            & (lis["l_pre"] <= F.col("b_end")),
        )
        .groupBy("url", "l_pre", "l_end")
        .agg(F.max("b_pre").alias("owner"))
    )

    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        F.col("url").alias("t_url"), F.col("pre_ord").alias("t_ord"),
        "text")
    li_text = (
        owned.join(
            texts,
            (owned["url"] == texts["t_url"])
            & (texts["t_ord"] > owned["l_pre"])
            & (texts["t_ord"] <= owned["l_end"]),
            "left",
        )
        .repartition("url")
        .groupBy("url", "l_pre", "l_end", "owner")
        .agg(
            F.expr(
                "btrim(array_join(transform(array_sort("
                "collect_list(struct(t_ord, text))), s -> s.text), ''),"
                " ' \\t\\n\\r')"
            ).alias("text")
        )
    )

    anchors = nodes.where(
        is_elem & (F.col("tag") == "a") & F.col("attrs")["href"].isNotNull()
    ).select(
        F.col("url").alias("a_url"), F.col("pre_ord").alias("a_ord"),
        F.col("attrs")["href"].alias("a_href"),
    )
    li_href = (
        li_text.join(
            anchors,
            (li_text["url"] == anchors["a_url"])
            & (anchors["a_ord"] > li_text["l_pre"])
            & (anchors["a_ord"] <= li_text["l_end"]),
            "left",
        )
        .groupBy("url", "l_pre", "owner", "text")
        .agg(F.min_by("a_href", "a_ord").alias("href"))
    )

    w_crumb = Window.partitionBy("url", "owner").orderBy("l_pre")
    return (
        li_href.withColumn(
            "crumb_pos", F.row_number().over(w_crumb).cast("long"))
        .join(
            conts.select("url", F.col("b_pre").alias("owner"), "trail_pos"),
            ["url", "owner"],
        )
        .select("url", "trail_pos", "crumb_pos", "text", "href")
    )
