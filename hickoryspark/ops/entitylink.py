"""Anchor-prior entity linking — the dictionary method behind
wikification (Mihalcea & Csomai 2007; Milne & Witten 2008): the web's
own link graph is a labeled dataset mapping anchor TEXT to link
TARGET, and plain-text mentions link to the target their surface form
most often points at.

Two halves:

- ``anchor_priors``: (lower(anchor_text), resolved target) counts
  from a link-edge frame (ops/links.extract_links output), reduced to
  the argmax target per surface form. Tie rule pinned: greatest
  (n, target) struct — deterministic on both engines for ASCII
  targets (the editdist ASCII-contract rule).
- ``link_mentions``: capitalized word runs in document text
  (``[A-Z][a-z]+( [A-Z][a-z]+)*``, \\b-delimited — Java∩RE2 subset,
  no lookaround) looked up by lowercased surface form; one output row
  per mention OCCURRENCE that has a prior (unknown mentions drop —
  this is linking, not NER).

Scale shape: priors are one groupBy(surface, target) + one
groupBy(surface) argmax — aggregations, never a per-surface window
(stopword-like anchors such as "here" would funnel one task).
Mentions are a regexp_extract_all explode joined to the prior table
by surface equi-key; AQE broadcasts the prior side when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anchor_priors", "link_mentions", "MENTION_RE"]

MENTION_RE = r"\b[A-Z][a-z]+( [A-Z][a-z]+)*\b"


def anchor_priors(edges: DataFrame) -> DataFrame:
    """Link edges (anchor_text, resolved) -> (surface, target, n):
    the argmax target per lowercased non-empty anchor surface."""
    surface = F.lower(
        F.btrim(F.col("anchor_text"), F.lit(" \t\n\x0b\f\r"))
    )
    counted = (
        edges.where(
            (surface != "") & F.col("resolved").isNotNull()
        )
        .groupBy(
            surface.alias("surface"),
            F.col("resolved").alias("target"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        counted.groupBy("surface")
        .agg(F.max(F.struct("n", "target")).alias("_best"))
        .select(
            "surface",
            F.col("_best.target").alias("target"),
            F.col("_best.n").alias("n"),
        )
    )


def link_mentions(
    docs: DataFrame, priors: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, text) x priors -> (doc_id, mention, target, prior_n),
    one row per linked mention occurrence."""
    mentions = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(MENTION_RE), F.lit(0)
            )
        ).alias("mention"),
    )
    return (
        mentions.join(
            priors, F.lower(F.col("mention")) == F.col("surface")
        )
        .select(
            "doc_id", "mention", "target",
            F.col("n").alias("prior_n"),
        )
    )
