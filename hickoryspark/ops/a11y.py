"""Accessibility audit signals — per-page counts of the classic
machine-checkable WCAG failures (missing img alt text, skipped heading
levels, unlabeled form controls, missing document language). A quality
dimension HTML corpora are routinely filtered/stratified on, and a
crawl-side report real site owners ask for.

Pinned semantics (the gate oracle reproduces them):

- ``n_img`` counts ``img`` elements; ``n_img_noalt`` those with NO
  ``alt`` attribute at all (``alt=""`` is a deliberate decorative
  marker and counts as labeled);
- ``n_headings`` counts h1-h6; ``n_heading_skips`` counts headings
  whose level exceeds the PREVIOUS heading's level by more than one,
  in document order, with the virtual level before the first heading
  = 0 (so an h1 first is fine, an h2-or-deeper first is a skip);
- ``n_inputs`` counts ``input``/``select``/``textarea`` elements,
  excluding ``input type=hidden`` (ASCII case-insensitive);
  ``n_inputs_unlabeled`` those with none of: an ``id`` matched by a
  ``label for=`` on the same page, a ``label`` ancestor, or a
  non-empty ``aria-label``;
- ``html_lang`` is 1 iff the document's ``html`` element carries a
  non-empty ``lang``.

Spark shape: four url-keyed aggregations (imgs, headings+lag window,
controls with one url-equi label-for join + one url-equi label
interval join, html lang) assembled by url equi-joins — one
co-partitioned shuffle family, every join key starts with url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT

__all__ = ["accessibility_signals"]

_HEADINGS = ("h1", "h2", "h3", "h4", "h5", "h6")
_CONTROLS = ("input", "select", "textarea")


def accessibility_signals(nodes: DataFrame) -> DataFrame:
    """Node table -> one row per page:
    ``(url, n_img, n_img_noalt, n_headings, n_heading_skips,
    n_inputs, n_inputs_unlabeled, html_lang)``."""
    is_elem = F.col("type") == TYPE_ELEMENT
    zero = F.lit(0).cast("long")

    pages = nodes.where(F.col("node_id") == 0).select("url")

    imgs = (
        nodes.where(is_elem & (F.col("tag") == "img"))
        .groupBy("url")
        .agg(
            F.count("*").cast("long").alias("n_img"),
            F.sum(F.when(F.col("attrs")["alt"].isNull(), 1).otherwise(0))
            .cast("long").alias("n_img_noalt"),
        )
    )

    w_doc = Window.partitionBy("url").orderBy("pre_ord")
    heads = (
        nodes.where(is_elem & F.col("tag").isin(*_HEADINGS))
        .select("url", "pre_ord",
                F.substring("tag", 2, 1).cast("int").alias("lvl"))
        .withColumn("prev", F.coalesce(F.lag("lvl").over(w_doc), F.lit(0)))
        .groupBy("url")
        .agg(
            F.count("*").cast("long").alias("n_headings"),
            F.sum(F.when(F.col("lvl") > F.col("prev") + 1, 1).otherwise(0))
            .cast("long").alias("n_heading_skips"),
        )
    )

    controls = nodes.where(
        is_elem & F.col("tag").isin(*_CONTROLS)
        & ~((F.col("tag") == "input")
            & (F.lower(F.coalesce(F.col("attrs")["type"], F.lit("")))
               == "hidden"))
    ).select(
        "url", F.col("pre_ord").alias("c_ord"),
        F.col("attrs")["id"].alias("c_id"),
        (F.coalesce(F.col("attrs")["aria-label"], F.lit("")) != "")
        .alias("has_aria"),
    )
    label_for = (
        nodes.where(is_elem & (F.col("tag") == "label")
                    & F.col("attrs")["for"].isNotNull())
        .select(F.col("url").alias("f_url"),
                F.col("attrs")["for"].alias("f_id"))
        .distinct()
    )
    label_iv = nodes.where(is_elem & (F.col("tag") == "label")).select(
        F.col("url").alias("i_url"),
        F.col("pre_ord").alias("i_pre"),
        F.col("subtree_end").alias("i_end"),
    )
    ctl = (
        controls.join(
            label_for,
            (controls["url"] == label_for["f_url"])
            & controls["c_id"].isNotNull()
            & (controls["c_id"] == label_for["f_id"]),
            "left",
        )
        .withColumn("has_for", F.col("f_id").isNotNull())
        .drop("f_url", "f_id")
    )
    ctl = (
        ctl.join(
            label_iv,
            (ctl["url"] == label_iv["i_url"])
            & (ctl["c_ord"] > label_iv["i_pre"])
            & (ctl["c_ord"] <= label_iv["i_end"]),
            "left",
        )
        .groupBy("url", "c_ord", "has_aria", "has_for")
        .agg(F.max(F.col("i_pre").isNotNull()).alias("has_anc"))
    )
    inputs = ctl.groupBy("url").agg(
        F.count("*").cast("long").alias("n_inputs"),
        F.sum(
            F.when(~F.col("has_aria") & ~F.col("has_for")
                   & ~F.col("has_anc"), 1).otherwise(0)
        ).cast("long").alias("n_inputs_unlabeled"),
    )

    lang = (
        nodes.where(is_elem & (F.col("tag") == "html"))
        .groupBy("url")
        .agg(
            F.max(
                (F.coalesce(F.col("attrs")["lang"], F.lit("")) != "")
                .cast("long")
            ).alias("html_lang")
        )
    )

    out = (
        pages.join(imgs, "url", "left")
        .join(heads, "url", "left")
        .join(inputs, "url", "left")
        .join(lang, "url", "left")
    )
    return out.select(
        "url",
        *[F.coalesce(c, zero).alias(c)
          for c in ("n_img", "n_img_noalt", "n_headings",
                    "n_heading_skips", "n_inputs", "n_inputs_unlabeled",
                    "html_lang")],
    )
