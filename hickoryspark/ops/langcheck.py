"""Declared-vs-detected language consistency — joins the ``<html
lang>`` declaration (ops/metadata.page_metadata) against content
language ID (ops/textstats.lang_trigram). Mis-declared lang is a
classic crawl-quality signal: machine-translated spam and template
misconfigurations declare one language and ship another, and language
routers must decide which carrier to trust.

Pinned semantics (the gate oracle reproduces them):

- ``declared`` is the raw ``html_lang`` value (NULL when the page has
  none); ``declared_primary`` is its BCP-47 primary subtag — the
  ASCII-lowercased text before the first ``-`` (empty string declared
  -> NULL primary);
- ``detected`` is the trigram argmax (``unk`` when no profile scores);
- ``lang_match`` is 1 when ``declared_primary = detected``, 0 when
  they differ, NULL when nothing was declared — an undeclared page is
  not a MISdeclared page.

Spark shape: one url equi-join between two already-aggregated
per-page relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lang_consistency"]


def lang_consistency(meta: DataFrame, detected: DataFrame) -> DataFrame:
    """``meta(url, html_lang, ...)`` x ``detected(url, lang_pred, ...)``
    -> ``(url, declared, declared_primary, detected, lang_match)``."""
    primary = F.when(
        F.coalesce(F.col("html_lang"), F.lit("")) != "",
        F.lower(F.split(F.col("html_lang"), "-").getItem(0)),
    )
    return (
        meta.select("url", F.col("html_lang").alias("declared"),
                    primary.alias("declared_primary"))
        .join(detected.select("url", F.col("lang_pred").alias("detected")),
              "url")
        .select(
            "url", "declared", "declared_primary", "detected",
            F.when(F.col("declared_primary").isNotNull(),
                   (F.col("declared_primary") == F.col("detected"))
                   .cast("long")).alias("lang_match"),
        )
    )
