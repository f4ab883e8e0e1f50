"""Hero-image selection — pick each page's representative image (the
thumbnail/card/preview primitive: social-card renderers, dataset
cover images, SERP thumbnails all need exactly one image per page).

Pinned priority (first carrier that yields wins; no row when none):

1. ``og:image`` meta content (the Open Graph contract — what social
   cards actually use), first in document order;
2. ``link rel=image_src`` href (the legacy Facebook/Digg carrier),
   first in document order;
3. the first ``<img>`` whose width AND height digit-run attributes
   are both >= :data:`MIN_HERO_DIM` (a sized content image beats
   icons/trackers);
4. the first ``<img>`` with a src at all.

Sources are reported in ``hero_source`` as ``og`` / ``link`` /
``sized_img`` / ``first_img``. The src is emitted AS WRITTEN
(callers resolve/normalize — composing the URL resolver here would
hit the 64 KB codegen limit, the resolve_href lesson).

Scale shape: ONE pruned url groupBy; every carrier is a min-struct
first-in-doc-order pick inside the same aggregate (the page_metadata
pattern) and the priority coalesce is a pure column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT
from hickoryspark.ops.media import _digit_prefix

__all__ = ["hero_images", "MIN_HERO_DIM"]

MIN_HERO_DIM = 200


def hero_images(nodes: DataFrame) -> DataFrame:
    """Node table -> (url, hero_src, hero_source); pages with no
    carrier emit no row."""
    a = F.col("attrs")
    is_el = F.col("type") == TYPE_ELEMENT
    tag = F.col("tag")
    is_og = (is_el & (tag == "meta")
             & (F.lower(F.coalesce(a["property"], F.lit("")))
                == "og:image") & a["content"].isNotNull())
    rel = F.lower(F.coalesce(a["rel"], F.lit("")))
    is_link = (is_el & (tag == "link") & (rel == "image_src")
               & a["href"].isNotNull())
    is_img = is_el & (tag == "img") & a["src"].isNotNull()
    w = _digit_prefix(a["width"])
    h = _digit_prefix(a["height"])
    is_sized = (is_img & (F.coalesce(w, F.lit(0)) >= MIN_HERO_DIM)
                & (F.coalesce(h, F.lit(0)) >= MIN_HERO_DIM))

    def first(cond, val):
        return F.min(F.when(cond, F.struct(F.col("pre_ord"),
                                           val.alias("v"))))["v"]

    agged = (
        nodes.where(is_og | is_link | is_img)
        .groupBy("url")
        .agg(
            first(is_og, a["content"]).alias("_og"),
            first(is_link, a["href"]).alias("_link"),
            first(is_sized, a["src"]).alias("_sized"),
            first(is_img, a["src"]).alias("_any"),
        ))
    src = F.coalesce(F.col("_og"), F.col("_link"), F.col("_sized"),
                     F.col("_any"))
    source = (
        F.when(F.col("_og").isNotNull(), F.lit("og"))
        .when(F.col("_link").isNotNull(), F.lit("link"))
        .when(F.col("_sized").isNotNull(), F.lit("sized_img"))
        .otherwise(F.lit("first_img")))
    return agged.select("url", src.alias("hero_src"),
                        source.alias("hero_source"))
