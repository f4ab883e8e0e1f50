"""Rule-based page-type classification — the crawl-scheduling /
corpus-composition primitive (article pages feed the text corpus,
listing/hub pages feed the frontier, form pages neither). The
DOM-shape signals are the classic boilerpipe/SERP heuristics.

Pinned rules (priority order, first match wins — all thresholds
documented constants):

1. ``form``:    >= 1 ``<form>`` and text < 500 chars;
2. ``listing``: >= 20 links and link density >= 300 milli;
3. ``media``:   >= 5 ``<img>`` and text < 1000 chars;
4. ``article``: text >= 500 chars and link density < 300 milli;
5. ``other``.

``link density`` here = anchor DIRECT-text chars * 1000 div total
text chars (direct text-node children of ``<a>`` — the link_graph
anchor-text rule; ops/textstats.link_density is the token-based
boilerpipe variant, this is the char-based DOM-shape variant).

Scale shape: ONE pruned url groupBy computes every count (element
flags and text lengths are map-side-combinable sums); the
classification is a pure column when-chain on the aggregate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

__all__ = ["classify_pages", "FORM_TEXT_MAX", "LISTING_LINKS_MIN",
           "LISTING_DENSITY_MIN", "MEDIA_IMGS_MIN", "MEDIA_TEXT_MAX",
           "ARTICLE_TEXT_MIN", "ARTICLE_DENSITY_MAX"]

FORM_TEXT_MAX = 500
LISTING_LINKS_MIN = 20
LISTING_DENSITY_MIN = 300
MEDIA_IMGS_MIN = 5
MEDIA_TEXT_MAX = 1000
ARTICLE_TEXT_MIN = 500
ARTICLE_DENSITY_MAX = 300


def classify_pages(nodes: DataFrame) -> DataFrame:
    """Node table -> (url, n_links, n_imgs, n_forms, text_chars,
    link_density_milli, page_type)."""
    is_el = F.col("type") == TYPE_ELEMENT
    is_txt = F.col("type") == TYPE_TEXT
    tag = F.col("tag")
    agg = (
        nodes.where(is_el | is_txt)
        .groupBy("url")
        .agg(
            F.sum(F.when(is_el & (tag == "a")
                         & F.col("attrs")["href"].isNotNull(), 1)
                  .otherwise(0)).cast("long").alias("n_links"),
            F.sum(F.when(is_el & (tag == "img"), 1).otherwise(0))
            .cast("long").alias("n_imgs"),
            F.sum(F.when(is_el & (tag == "form"), 1).otherwise(0))
            .cast("long").alias("n_forms"),
            F.sum(F.when(is_txt, F.length(F.col("text")))
                  .otherwise(0)).cast("long").alias("text_chars"),
            F.sum(F.when(
                is_txt & (F.col("parent_type") == TYPE_ELEMENT)
                & (F.col("parent_tag") == "a"),
                F.length(F.col("text"))).otherwise(0))
            .cast("long").alias("anchor_chars"),
        ))
    dens = F.when(F.col("text_chars") > 0,
                  F.expr("(1000 * anchor_chars) div text_chars")) \
        .otherwise(F.lit(0)).cast("long")
    out = agg.withColumn("link_density_milli", dens)
    t = F.col("text_chars")
    d = F.col("link_density_milli")
    ptype = (
        F.when((F.col("n_forms") >= 1) & (t < FORM_TEXT_MAX),
               F.lit("form"))
        .when((F.col("n_links") >= LISTING_LINKS_MIN)
              & (d >= LISTING_DENSITY_MIN), F.lit("listing"))
        .when((F.col("n_imgs") >= MEDIA_IMGS_MIN)
              & (t < MEDIA_TEXT_MAX), F.lit("media"))
        .when((t >= ARTICLE_TEXT_MIN) & (d < ARTICLE_DENSITY_MAX),
              F.lit("article"))
        .otherwise(F.lit("other")))
    return out.select("url", "n_links", "n_imgs", "n_forms",
                      "text_chars", "link_density_milli",
                      ptype.alias("page_type"))
