"""Image/media–text pair extraction — the multimodal corpus miner.

LAION-style image-text datasets are mined from exactly this relation:
every ``<img>`` (and ``<video>``/``<audio>``/``<source>``) with its
resolved source URL, srcset candidates, alt text, declared dimensions,
and the caption of its nearest enclosing ``<figure>``. The reference
engine has no equivalent; this extends the §2 surface the same way
ops/links.py does for anchors.

Pinned semantics (so the closed-form gate oracle can reproduce them):

- a media row is an element with tag in {img, video, audio, source}
  carrying a ``src`` OR (img/source) ``srcset`` attribute;
- ``media_pos`` is the 1-based document-order position among the
  page's media rows;
- ``resolved`` = ops/links.resolve_href(url, src); NULL when only
  srcset is present;
- ``srcset`` candidates: the attribute split on ``,``, each candidate
  ASCII-ws-trimmed, its URL = the first ASCII-ws-separated token;
  empty candidates dropped; emitted joined with ``|`` (raw urls —
  callers explode + resolve when they need absolutes). This is the
  common-case grammar; a comma INSIDE a candidate URL (spec-legal
  only in data: urls) splits wrong and is out of scope;
- ``width``/``height``: the leading decimal digit run of the
  attribute (HTML's valid non-negative integer), NULL otherwise;
- ``caption``: document-order concatenation of every text node lying
  inside a ``<figcaption>`` of the NEAREST enclosing ``<figure>``
  (ownership by pre_ord/subtree_end interval, the microdata rule);
  NULL when no enclosing figure or no figcaption text. Nested
  figures: the nearest figure owns, and any figcaption inside its
  interval contributes (documented simplification);
- ``alt`` is emitted as written ('' stays '').

Spark shape: url-local equi-joins with interval residuals throughout
(the descendant_rel pattern — never a nested loop). The FIRST join's
url equi-key establishes url hash partitioning that every downstream
stage reuses: the groupBys key on (url, m_id, ...) with url a subset
of the partitioning (subset satisfaction — no reshuffle), the caption
join is url-equi, and the media_pos window partitions on url — so the
whole pipeline is one url shuffle per input relation and nothing
after. Text rows inside nested figcaptions are deduped (left_semi)
BEFORE the media join so no double-count survives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT
from hickoryspark.ops.links import resolve_href
from hickoryspark.ops.metadata import ASCII_WS_RE

__all__ = ["extract_images", "parse_srcset", "MEDIA_TAGS"]

MEDIA_TAGS = ("img", "video", "audio", "source")

_WS_TRIM = " \t\n\x0b\f\r"


def parse_srcset(col) -> "F.Column":
    """Array of candidate URLs from a srcset attribute value (column
    expr): comma-split, trim, first ws token; empties dropped."""
    return F.filter(
        F.transform(
            F.split(col, ","),
            lambda c: F.try_element_at(
                F.filter(F.split(F.btrim(c, F.lit(_WS_TRIM)), ASCII_WS_RE),
                         lambda t: t != ""),
                F.lit(1),
            ),
        ),
        lambda u: u.isNotNull(),
    )


def _digit_prefix(col) -> "F.Column":
    v = F.regexp_extract(col, r"^([0-9]+)", 1)
    return F.when(v != "", v.cast("long"))


def extract_images(nodes: DataFrame) -> DataFrame:
    """Node table -> one row per media element: ``(url, media_pos,
    tag, src, resolved, srcset, alt, width, height, caption)``."""
    a = F.col("attrs")
    is_elem = F.col("type") == TYPE_ELEMENT
    media = nodes.where(
        is_elem
        & F.col("tag").isin(*MEDIA_TAGS)
        & (
            a["src"].isNotNull()
            # srcset qualifies only the elements that define it
            | (F.col("tag").isin("img", "source")
               & a["srcset"].isNotNull())
        )
    ).select(
        "url",
        F.col("node_id").alias("m_id"),
        F.col("pre_ord").alias("m_ord"),
        "tag",
        a["src"].alias("src"),
        a["srcset"].alias("srcset_raw"),
        a["alt"].alias("alt"),
        a["width"].alias("w_raw"),
        a["height"].alias("h_raw"),
    )
    figures = nodes.where(is_elem & (F.col("tag") == "figure")).select(
        F.col("url").alias("f_url"),
        F.col("pre_ord").alias("f_ord"),
        F.col("subtree_end").alias("f_end"),
    )
    figcaps = nodes.where(is_elem & (F.col("tag") == "figcaption")).select(
        F.col("url").alias("fc_url"),
        F.col("pre_ord").alias("fc_ord"),
        F.col("subtree_end").alias("fc_end"),
    )
    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        F.col("url").alias("t_url"),
        F.col("pre_ord").alias("t_ord"),
        F.col("text").alias("t_text"),
    )
    # text nodes inside ANY figcaption, deduped by position (nested
    # figcaptions would otherwise emit the same text row twice)
    fc_texts = (
        texts.join(
            figcaps,
            (texts["t_url"] == figcaps["fc_url"])
            & (texts["t_ord"] > figcaps["fc_ord"])
            & (texts["t_ord"] <= figcaps["fc_end"]),
            "left_semi",
        )
    )
    # nearest enclosing figure per media element
    owned = media.join(
        figures,
        (media["url"] == figures["f_url"])
        & (figures["f_ord"] < media["m_ord"])
        & (media["m_ord"] <= figures["f_end"]),
        "left",
    ).groupBy(
        "url", "m_id", "m_ord", "tag", "src", "srcset_raw", "alt",
        "w_raw", "h_raw",
    ).agg(
        F.max(F.struct("f_ord", "f_end")).alias("_fig"),
    )
    capped = owned.join(
        fc_texts,
        (owned["url"] == fc_texts["t_url"])
        & fc_texts["t_ord"].between(
            owned["_fig"]["f_ord"] + 1, owned["_fig"]["f_end"]
        ),
        "left",
    ).groupBy(
        "url", "m_id", "m_ord", "tag", "src", "srcset_raw", "alt",
        "w_raw", "h_raw",
    ).agg(
        F.when(
            F.count("t_ord") > 0,
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("t_ord", "t_text"))),
                    lambda s: s["t_text"],
                ),
                "",
            ),
        ).alias("caption"),
    )
    w = Window.partitionBy("url").orderBy("m_ord")
    return capped.select(
        "url",
        F.row_number().over(w).cast("long").alias("media_pos"),
        "tag",
        "src",
        F.when(
            F.col("src").isNotNull(),
            resolve_href(F.col("url"), F.col("src")),
        ).alias("resolved"),
        F.when(
            F.col("srcset_raw").isNotNull(),
            F.array_join(parse_srcset(F.col("srcset_raw")), "|"),
        ).alias("srcset"),
        "alt",
        _digit_prefix(F.col("w_raw")).alias("width"),
        _digit_prefix(F.col("h_raw")).alias("height"),
        "caption",
    )
