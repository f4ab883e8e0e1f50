"""jusText-style block classification — per-block boilerplate removal
(Pomikálek 2011, "Removing boilerplate and duplicate content from web
corpora", the algorithm behind the jusText library and the corpora
behind many web-text LMs).

The third boilerplate carrier in this repo, and the only
*context-sensitive* one: ops/boilerplate.py removes site-level
template subtrees (cross-page frequency), ops/lines.py removes
corpus-frequent lines; jusText classifies each block of ONE page from
its own features (length, stopword density, link density) and then
lets unambiguous neighbors decide the ambiguous blocks — no corpus
statistics needed, so it works on the very first page of a crawl.

Pinned semantics (simplified deterministic variant, integer-exact so
closed-form oracles can reproduce it; thresholds differ slightly from
the jusText defaults and are pinned here as module constants):

- a BLOCK is a maximal element with tag in ``BLOCK_TAGS`` (no
  strict ancestor with a block tag — ``<li><p>..`` is one li block);
- block text: descendant text nodes in document order whose parent is
  an element not in ``NONRENDERED_TAGS`` (script/style/template/
  noscript rawtext and comment data do NOT count — the *rendered*
  text notion, deliberately narrower than the links.py subtree rule);
- ``chars`` = length of the ASCII-whitespace-collapsed + trimmed
  concatenation; ``words`` = its single-space token count (0 when
  empty); blocks with ``chars == 0`` are not emitted;
- ``stop_ppm`` = ``(1_000_000 * n_stopword_tokens) div words``
  (case-insensitive membership in ``STOPWORDS``; 0 when no words);
- ``link_ppm`` = ``(1_000_000 * raw_anchor_chars) div raw_chars``
  over RAW (uncollapsed) text-node lengths; a text node is anchor
  text iff some ``<a>`` element's pre-order interval contains it;
- context-free class (first match wins):
  ``link_ppm > MAX_LINK_PPM`` -> bad; text contains U+00A9 -> bad;
  ``chars < LENGTH_LOW`` -> bad if any anchor chars else short;
  ``stop_ppm >= STOP_HIGH_PPM`` -> good if ``chars > LENGTH_HIGH``
  else neargood; ``stop_ppm >= STOP_LOW_PPM`` -> neargood;
  otherwise bad;
- context-sensitive revision (two passes, document order):
  1. neargood -> good iff the nearest preceding OR following block
     with context-free class in {good, bad} is good, else bad
     (missing neighbor counts as bad);
  2. short -> good iff the nearest preceding OR following block
     whose PASS-1 class is non-null is good, else bad (shorts are
     transparent to the scan — last/first ignorenulls).

Scale shape: the maximal-block anti-join, the text interval join and
the anchor-membership semi-probe are all url-equi joins (never a
cross product), and the per-block aggregation plus every revision
window run on the same url-keyed shuffle. Per-block state is bounded
by the block's own text (a page-local quantity); no corpus-wide
window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

__all__ = ["justext_blocks", "BLOCK_TAGS", "STOPWORDS"]

BLOCK_TAGS = (
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "dd", "dt", "td",
    "th", "blockquote", "pre", "figcaption", "caption",
)

NONRENDERED_TAGS = ("script", "style", "template", "noscript")

#: pinned 25-word English function-word list (enough for the density
#: signal; real deployments would swap a per-language list in).
STOPWORDS = (
    "the", "of", "and", "to", "a", "in", "is", "it", "you", "that",
    "was", "for", "on", "are", "as", "with", "they", "at", "be",
    "this", "have", "from", "or", "by", "not",
)

MAX_LINK_PPM = 200_000
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOP_HIGH_PPM = 300_000
STOP_LOW_PPM = 250_000

#: ASCII whitespace run (Java \s class — the pinned repo-wide rule;
#: Python's \s is Unicode-aware and would diverge).
_WS_RUN = "[ \\t\\n\\x0B\\f\\r]+"


def justext_blocks(nodes: DataFrame) -> DataFrame:
    """Node table -> one row per non-empty maximal block:
    ``(url, block_pos, tag, chars, words, stop_ppm, link_ppm,
    cf_class, final_class)``."""
    is_elem = F.col("type") == TYPE_ELEMENT
    cand = nodes.where(is_elem & F.col("tag").isin(*BLOCK_TAGS)).select(
        "url",
        F.col("pre_ord").alias("b_ord"),
        F.col("subtree_end").alias("b_end"),
        "tag",
    )
    # maximal blocks: drop candidates with a strict block-tag ancestor
    anc = cand.select(
        F.col("url").alias("a_url"),
        F.col("b_ord").alias("a_ord"),
        F.col("b_end").alias("a_end"),
    )
    blocks = cand.join(
        anc,
        (cand["url"] == anc["a_url"])
        & (anc["a_ord"] < cand["b_ord"])
        & (cand["b_ord"] <= anc["a_end"]),
        "left_anti",
    )

    texts = nodes.where(
        (F.col("type") == TYPE_TEXT)
        & (F.col("parent_type") == TYPE_ELEMENT)
        & ~F.col("parent_tag").isin(*NONRENDERED_TAGS)
    ).select(
        F.col("url").alias("t_url"),
        F.col("pre_ord").alias("t_ord"),
        F.col("text").alias("t_text"),
    )
    anchors = nodes.where(is_elem & (F.col("tag") == "a")).select(
        F.col("url").alias("l_url"),
        F.col("pre_ord").alias("l_ord"),
        F.col("subtree_end").alias("l_end"),
    )
    in_anchor = texts.join(
        anchors,
        (texts["t_url"] == anchors["l_url"])
        & (texts["t_ord"] > anchors["l_ord"])
        & (texts["t_ord"] <= anchors["l_end"]),
        "left_semi",
    ).select("t_url", "t_ord", F.lit(1).alias("in_a"))

    flagged = texts.join(in_anchor, ["t_url", "t_ord"], "left")
    feat = (
        blocks.join(
            flagged,
            (blocks["url"] == flagged["t_url"])
            & (flagged["t_ord"] > blocks["b_ord"])
            & (flagged["t_ord"] <= blocks["b_end"]),
            "left",
        )
        .repartition("url")
        .groupBy("url", "b_ord", "tag")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("t_ord", "t_text"))),
                    lambda s: s["t_text"],
                ),
                "",
            ).alias("raw"),
            F.coalesce(F.sum(F.length("t_text")), F.lit(0))
            .cast("long").alias("raw_chars"),
            F.coalesce(
                F.sum(F.when(F.col("in_a") == 1, F.length("t_text"))),
                F.lit(0),
            ).cast("long").alias("link_raw"),
        )
    )

    norm = F.trim(F.regexp_replace(F.col("raw"), _WS_RUN, " "))
    toks = F.split(norm, " ")
    feat = feat.select(
        "url", "b_ord", "tag",
        F.length(norm).cast("long").alias("chars"),
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(F.size(toks)).cast("long").alias("words"),
        F.when(
            F.length(norm) == 0, F.lit(0)
        ).otherwise(
            F.size(F.filter(
                toks, lambda t: F.lower(t).isin(*STOPWORDS)))
        ).cast("long").alias("n_stop"),
        F.contains(norm, F.lit("©")).alias("has_copy"),
        "raw_chars", "link_raw",
    ).where(F.col("chars") > 0)

    stop_ppm = F.when(F.col("words") == 0, F.lit(0).cast("long")).otherwise(
        F.expr("(1000000 * n_stop) div words"))
    link_ppm = F.expr("(1000000 * link_raw) div raw_chars")
    feat = feat.select(
        "url", "b_ord", "tag", "chars", "words",
        stop_ppm.alias("stop_ppm"), link_ppm.alias("link_ppm"),
        "has_copy", "link_raw",
    )

    cf = (
        F.when(F.col("link_ppm") > MAX_LINK_PPM, F.lit("bad"))
        .when(F.col("has_copy"), F.lit("bad"))
        .when(
            F.col("chars") < LENGTH_LOW,
            F.when(F.col("link_raw") > 0, F.lit("bad"))
            .otherwise(F.lit("short")),
        )
        .when(
            F.col("stop_ppm") >= STOP_HIGH_PPM,
            F.when(F.col("chars") > LENGTH_HIGH, F.lit("good"))
            .otherwise(F.lit("neargood")),
        )
        .when(F.col("stop_ppm") >= STOP_LOW_PPM, F.lit("neargood"))
        .otherwise(F.lit("bad"))
    )
    feat = feat.withColumn("cf_class", cf)

    w = Window.partitionBy("url").orderBy("b_ord")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    w_next = w.rowsBetween(1, Window.unboundedFollowing)
    gb = F.when(F.col("cf_class").isin("good", "bad"), F.col("cf_class"))
    feat = feat.withColumn(
        "prev_gb", F.last(gb, ignorenulls=True).over(w_prev)
    ).withColumn(
        "next_gb", F.first(gb, ignorenulls=True).over(w_next)
    ).withColumn(
        "class1",
        F.when(
            F.col("cf_class") == "neargood",
            F.when(
                (F.col("prev_gb") == "good") | (F.col("next_gb") == "good"),
                F.lit("good"),
            ).otherwise(F.lit("bad")),
        ).otherwise(gb),
    )
    c1 = F.col("class1")
    feat = feat.withColumn(
        "prev1", F.last(c1, ignorenulls=True).over(w_prev)
    ).withColumn(
        "next1", F.first(c1, ignorenulls=True).over(w_next)
    )
    final = F.when(
        F.col("cf_class") == "short",
        F.when(
            (F.col("prev1") == "good") | (F.col("next1") == "good"),
            F.lit("good"),
        ).otherwise(F.lit("bad")),
    ).otherwise(c1)

    return feat.select(
        "url",
        F.row_number().over(w).cast("long").alias("block_pos"),
        "tag", "chars", "words", "stop_ppm", "link_ppm",
        "cf_class", final.alias("final_class"),
    )
