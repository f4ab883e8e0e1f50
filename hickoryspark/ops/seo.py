"""On-page SEO audit — the crawl-analytics hygiene rollup every site
auditor runs (title/description length bands, H1 discipline,
canonical self-reference, title↔H1 consistency). Composes the REAL
metadata extractor (ops/metadata.page_metadata) with an H1 aggregate
over the same node table.

Pinned rules (classic audit bands, documented constants):

- ``title_ok``: 10 <= title chars <= 60;
- ``desc_ok``: 50 <= meta-description chars <= 160;
- ``h1_ok``: exactly one ``<h1>``;
- ``canon_ok``: a canonical link whose href equals the page url
  BYTE-EXACTLY (callers normalize upstream — composing the full URL
  normalizer here would blow the 64 KB codegen limit, the
  resolve_href lesson);
- ``title_h1_overlap_milli``: Jaccard (milli, exact integer) of the
  DISTINCT ASCII-ws token sets of the title and the FIRST H1's
  direct text (no case folding); 0 when either side is empty;
- ``n_issues`` counts the four failed checks.

Scale shape: the H1 aggregate prunes to h1 elements + h1-parented
text rows before its url groupBy (the page_metadata intersect-after
pattern — the first-H1 pick happens INSIDE the aggregate arrays, no
window); the final url equi-join joins two url-grain aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT
from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["seo_audit", "TITLE_BAND", "DESC_BAND"]

TITLE_BAND = (10, 60)
DESC_BAND = (50, 160)


def _tokens(col):
    return F.array_distinct(
        F.filter(F.split(F.coalesce(col, F.lit("")),
                         ASCII_WS_SPLIT_RE),
                 lambda t: t != ""))


def seo_audit(nodes: DataFrame) -> DataFrame:
    """Node table -> one audit row per url: (url, title_len,
    desc_len, n_h1, canonical_self, title_h1_overlap_milli,
    n_issues)."""
    from hickoryspark.ops.metadata import page_metadata

    meta = page_metadata(nodes).select(
        "url", "title", "meta_description", "canonical")

    is_h1 = (F.col("type") == TYPE_ELEMENT) & (F.col("tag") == "h1")
    h1_text = (
        (F.col("type") == TYPE_TEXT)
        & (F.col("parent_type") == TYPE_ELEMENT)
        & (F.col("parent_tag") == "h1"))
    h1s = (
        nodes.where(is_h1 | h1_text)
        .groupBy("url")
        .agg(
            F.sum(F.when(is_h1, 1).otherwise(0)).cast("long")
            .alias("n_h1"),
            F.min(F.when(is_h1, F.struct("pre_ord", "node_id")))
            .alias("_first"),
            F.collect_list(
                F.when(h1_text,
                       F.struct(F.col("pre_ord"), F.col("parent_id"),
                                F.col("text"))))
            .alias("_texts")))
    first_h1_text = F.array_join(
        F.transform(
            F.array_sort(F.filter(
                F.col("_texts"),
                lambda s: s["parent_id"] == F.col("_first")["node_id"],
            )),
            lambda s: s["text"]),
        "")
    h1s = h1s.select("url", "n_h1", first_h1_text.alias("h1_text"))

    j = meta.join(h1s, "url", "left")
    tt = _tokens(F.col("title"))
    ht = _tokens(F.col("h1_text"))
    inter = F.size(F.array_intersect(tt, ht))
    union = F.size(F.array_union(tt, ht))
    title_len = F.length(F.coalesce(F.col("title"), F.lit("")))
    desc_len = F.length(F.coalesce(F.col("meta_description"),
                                   F.lit("")))
    n_h1 = F.coalesce(F.col("n_h1"), F.lit(0)).cast("long")
    canon = (F.col("canonical").isNotNull()
             & (F.col("canonical") == F.col("url"))).cast("long")
    title_ok = ((title_len >= TITLE_BAND[0])
                & (title_len <= TITLE_BAND[1])).cast("long")
    desc_ok = ((desc_len >= DESC_BAND[0])
               & (desc_len <= DESC_BAND[1])).cast("long")
    h1_ok = (n_h1 == 1).cast("long")
    return j.select(
        "url",
        title_len.cast("long").alias("title_len"),
        desc_len.cast("long").alias("desc_len"),
        n_h1.alias("n_h1"),
        canon.alias("canonical_self"),
        F.when(union > 0,
               F.expr("CAST(1000 AS BIGINT)") * inter.cast("long"))
        .otherwise(F.lit(0)).cast("long").alias("_num"),
        union.cast("long").alias("_den"),
        (F.lit(4) - title_ok - desc_ok - h1_ok - canon)
        .cast("long").alias("n_issues"),
    ).select(
        "url", "title_len", "desc_len", "n_h1", "canonical_self",
        F.when(F.col("_den") > 0,
               F.expr("_num div _den")).otherwise(F.lit(0))
        .cast("long").alias("title_h1_overlap_milli"),
        "n_issues",
    )
