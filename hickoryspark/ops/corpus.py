"""End-to-end training-corpus build — the composition a pipeline user
actually runs: crawl pages in, deduplicated quality text out.

One call chains the engine's own stages:

  extract_pages (spark/extract.py, the north-rule main-text walk)
    → quality_score (ops/textstats.py, all-integer micro-points)
    → threshold filter
    → exact dedup keeping the minimum url per content hash

Spark shape: the extract is the map-only parse stage; scoring is pure
JVM column math fused into it (no extra stage); the dedup is ONE
groupBy on ``md5(text)`` whose aggregates (min url, count) are
map-side combinable — so the whole pipeline is scan → map → one
shuffle, the minimum any content-global dedup can do. The filter runs
BEFORE the shuffle, so below-threshold pages never leave their task.

Returns (url, text, quality_ppm, n_dups, text_hash): one row per
distinct surviving content; ``n_dups`` is how many admitted pages
carried it (>1 = the duplicates this call removed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.textstats import quality_score
from hickoryspark.spark.extract import extract_pages

DEFAULT_MIN_QUALITY_PPM = 600_000


def build_corpus(
    pages_df: DataFrame,
    min_quality_ppm: int = DEFAULT_MIN_QUALITY_PPM,
) -> DataFrame:
    """pages(url, html, ...) → deduplicated, quality-filtered corpus
    rows (url, text, quality_ppm, n_dups, text_hash)."""
    ext = extract_pages(pages_df).select(
        F.col("url").alias("doc_id"), F.col("main_text").alias("text")
    )
    scored = quality_score(ext, extra_cols=("text",))
    kept = scored.where(F.col("quality_ppm") >= min_quality_ppm)
    return (
        kept.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("url"),
            # every row in a group carries identical text/score, so
            # min() is a deterministic pick, not a choice
            F.min("text").alias("text"),
            F.min("quality_ppm").alias("quality_ppm"),
            F.count("*").alias("n_dups"),
        )
        .select("url", "text", "quality_ppm", "n_dups", "text_hash")
    )
