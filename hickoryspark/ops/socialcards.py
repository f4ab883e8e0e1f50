"""Social-card metadata — the full OpenGraph / Twitter-card meta
surface as rows.

ops/metadata.py's page_metadata picks FOUR scalar fields (title,
description, og:title, og:description); multimodal corpus builders
also want og:image / og:video / twitter:card etc. — this operator
emits EVERY card meta as a row instead of widening that schema.

Pinned semantics (the gate oracle reproduces them):

- a CARD META is a ``meta`` element whose ``property`` OR (Twitter's
  convention) ``name`` attribute case-folds to an ``og:`` or
  ``twitter:``-prefixed key; ``property`` wins when both are present;
- ``key`` is emitted case-folded; ``namespace`` is its prefix
  (``og`` / ``twitter``);
- ``content`` is the ``content`` attribute as written (NULL when
  absent — a card meta without content is a real-world bug worth
  surfacing, not a row to drop);
- ``card_pos``: 1-based document order among the page's card metas.

Shuffle shape: one url window over the filtered meta rows — nothing
else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT

__all__ = ["social_cards"]

_PREFIX_RE = "^(og|twitter):"


def social_cards(nodes: DataFrame) -> DataFrame:
    """Node table -> ``(url, card_pos, namespace, key, content)``."""
    a = F.col("attrs")
    key = F.lower(F.coalesce(a["property"], a["name"]))
    cards = nodes.where(
        (F.col("type") == TYPE_ELEMENT)
        & (F.col("tag") == "meta")
        & key.rlike(_PREFIX_RE)
    ).select(
        "url", F.col("pre_ord").alias("_ord"),
        F.regexp_extract(key, _PREFIX_RE, 1).alias("namespace"),
        key.alias("key"),
        a["content"].alias("content"),
    )
    w = Window.partitionBy("url").orderBy("_ord")
    return cards.select(
        "url",
        F.row_number().over(w).cast("long").alias("card_pos"),
        "namespace", "key", "content",
    )
