"""Hidden-text (cloaking) audit — the SEO-spam / quality signal a
training-data pipeline wants before trusting a page's extracted text:
keyword-stuffed pages hide the stuffing from humans with CSS or
WHATWG hidden attributes while leaving it in the DOM for crawlers.
Reference semantics context: the reference engine walks the same node
shape (select.cljc's tag/attr predicates over hickory nodes); hidden
detection is a pipeline-side composition, not a reference operator.

Pinned semantics (exact, oracle-reproducible):

- A HIDDEN CARRIER is an element with any of:

  * a ``hidden`` attribute (WHATWG boolean attribute — presence,
    any value including '');
  * ``aria-hidden`` equal to ``true`` after ASCII trim + lowercase;
  * an inline ``style`` declaring ``display:none`` or
    ``visibility:hidden`` — declarations split on ``;``, each split
    at its FIRST ``:`` into (name, value), both ASCII-trimmed and
    lowercased; a declaration with no ``:`` never matches. No CSS
    shorthand/stylesheet/!important modeling (inline subset only —
    documented bound, same spirit as the boilerpipe-style signals in
    ops/textstats.py).

- The TEXT universe is the visible-text convention of
  ops/textstats.link_density: text nodes excluding script/style/
  noscript rawtext and comment data.
- A text node is HIDDEN iff it lies strictly inside ANY carrier's
  subtree interval (counted ONCE under nested carriers). Descendant
  re-reveals (``visibility:visible`` inside a hidden ancestor,
  ``hidden=until-found``) are deliberately NOT modeled — the audit
  counts what a conservative consumer would distrust.

Output (one row per page): ``(url, n_hidden_carriers, n_text_chars,
n_hidden_chars, hidden_char_ppm)`` with ``hidden_char_ppm =
(1e6 * hidden) div text`` (0 when no text) — exact integer ppm.

Spark shape: one url-equi interval LEFT SEMI join (the
selectors_rel.descendant_rel pattern — never a nested loop) + one
url groupBy; the url universe comes from the document-root rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ASCII whitespace trim for attribute/style tokens (Python/Java \s
#: divergence rule — CLAUDE.md): explicit class, never \s
_WS = " \t\n\x0b\f\r"


def _atrim(c: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(c, r"\A[ \t\n\x0b\f\r]+", ""),
        r"[ \t\n\x0b\f\r]+\z", "",
    )


def is_hidden_carrier(attrs: Column) -> Column:
    """Boolean Column: the pinned hidden-carrier rule over an
    ``attrs`` map (see module docstring)."""
    style = attrs["style"]
    decls = F.transform(
        F.split(style, ";"),
        lambda d: F.struct(
            F.lower(_atrim(F.when(
                F.instr(d, ":") > 0, F.substring_index(d, ":", 1)
            ))).alias("name"),
            F.lower(_atrim(F.when(
                F.instr(d, ":") > 0,
                F.substring(d, F.instr(d, ":") + 1, F.length(d)),
            ))).alias("value"),
        ),
    )
    style_hit = F.exists(
        decls,
        lambda s: ((s["name"] == "display") & (s["value"] == "none"))
        | ((s["name"] == "visibility") & (s["value"] == "hidden")),
    )
    return (
        attrs["hidden"].isNotNull()
        | (F.lower(_atrim(attrs["aria-hidden"])) == "true")
        | F.coalesce(style_hit, F.lit(False))
    )


def hidden_text_stats(nodes: DataFrame) -> DataFrame:
    """Per-page hidden-text audit over a node table (see module
    docstring for the pinned rule and output schema)."""
    from hickoryspark.nodes import (
        TYPE_COMMENT as _TC,
        TYPE_DOCUMENT as _TD,
        TYPE_ELEMENT as _TE,
        TYPE_TEXT as _TT,
    )

    excluded = F.col("parent_tag").isin("script", "style", "noscript") | (
        F.col("parent_type") == _TC
    )
    texts = nodes.where(
        (F.col("type") == _TT) & ~F.coalesce(excluded, F.lit(False))
    ).select(
        "url",
        F.col("pre_ord").alias("t_ord"),
        F.length("text").cast("long").alias("t_len"),
    )
    carriers = nodes.where(
        (F.col("type") == _TE)
        & F.coalesce(is_hidden_carrier(F.col("attrs")), F.lit(False))
    ).select(
        F.col("url").alias("h_url"),
        F.col("pre_ord").alias("h_ord"),
        F.col("subtree_end").alias("h_end"),
    )
    hidden_texts = texts.join(
        carriers,
        (texts["url"] == carriers["h_url"])
        & (texts["t_ord"] > carriers["h_ord"])
        & (texts["t_ord"] <= carriers["h_end"]),
        "left_semi",
    ).select("url", "t_ord", F.col("t_len").alias("h_len"))
    per_url = (
        texts.join(hidden_texts, ["url", "t_ord"], "left")
        .groupBy("url")
        .agg(
            F.sum("t_len").cast("long").alias("n_text_chars"),
            F.coalesce(F.sum("h_len"), F.lit(0)).cast("long")
            .alias("n_hidden_chars"),
        )
    )
    n_carriers = (
        carriers.groupBy(F.col("h_url").alias("url"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_hidden_carriers"))
    )
    urls = nodes.where(F.col("type") == _TD).select("url")
    return (
        urls.join(per_url, "url", "left")
        .join(n_carriers, "url", "left")
        .select(
            "url",
            F.coalesce("n_hidden_carriers", F.lit(0).cast("long"))
            .alias("n_hidden_carriers"),
            F.coalesce("n_text_chars", F.lit(0).cast("long"))
            .alias("n_text_chars"),
            F.coalesce("n_hidden_chars", F.lit(0).cast("long"))
            .alias("n_hidden_chars"),
        )
        .withColumn(
            "hidden_char_ppm",
            F.when(
                F.col("n_text_chars") > 0,
                F.expr("(1000000 * n_hidden_chars) div n_text_chars"),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )
