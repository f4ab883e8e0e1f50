"""Syndication detection — exact text reuse ACROSS hosts.

Wire-service copy, scraper mirrors, and press-release blasts all show
up as byte-identical documents on many hosts; dedup pipelines treat
them differently from same-site duplicates (keep one per story, often
preferring the canonical publisher). This operator rolls the corpus
up by content digest and counts distinct hosts per copy group.

Pinned semantics (oracle = full mirror):

- ``digest`` = md5(text) (hex, the crawl_delta convention — digests
  shuffle, bodies don't);
- one row per digest GROUP with at least 2 copies:
  ``(digest, n_copies, n_hosts, first_url, syndicated)`` where
  ``first_url`` = lexicographic min url, ``n_hosts`` counts DISTINCT
  ops/hosts.url_host folds, and ``syndicated`` = 1 iff n_hosts >= 2
  (same-host duplication is ordinary dup, not syndication).

Scale shape: one map-side project (md5 + host fold) then ONE groupBy
with map-side partial aggregation — the ops/metadata
canonical_clusters shape; a mega-group is just one count row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.hosts import duckdb_url_host_sql, url_host

__all__ = ["cross_host_duplicates", "duckdb_syndication_sql"]


def cross_host_duplicates(pages: DataFrame, url_col: str = "url",
                          text_col: str = "text") -> DataFrame:
    """``(digest, n_copies, n_hosts, first_url, syndicated)`` for
    every digest group with >= 2 copies."""
    return (
        pages.select(
            F.md5(F.col(text_col)).alias("digest"),
            url_host(F.col(url_col)).alias("host"),
            F.col(url_col).alias("u"),
        )
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.count_distinct("host").cast("long").alias("n_hosts"),
            F.min("u").alias("first_url"),
        )
        .where(F.col("n_copies") >= 2)
        .withColumn("syndicated",
                    (F.col("n_hosts") >= 2).cast("long"))
    )


def duckdb_syndication_sql(pages_rel: str) -> str:
    """Full DuckDB mirror: ``pages_rel`` must expose (url, text)."""
    host = duckdb_url_host_sql("url")
    return f"""
        SELECT md5(text) AS digest,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(COUNT(DISTINCT {host}) AS BIGINT) AS n_hosts,
               MIN(url) AS first_url,
               CAST(CASE WHEN COUNT(DISTINCT {host}) >= 2
                    THEN 1 ELSE 0 END AS BIGINT) AS syndicated
        FROM {pages_rel}
        GROUP BY md5(text)
        HAVING COUNT(*) >= 2"""
