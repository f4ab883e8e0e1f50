"""Unified crawl/index admission policy over the three robots carriers.

A production index pipeline must honor ALL opt-out channels or it
ships pages the publisher excluded: RFC 9309 robots.txt governs
whether the URL may be FETCHED at all, while the robots meta tag
(ops/metadata.meta_robots_flags) and the ``X-Robots-Tag`` response
header (ops/http.x_robots_flags) govern whether a fetched page may be
INDEXED / its links FOLLOWED.  Each carrier already has its own op and
gate; this module is the merge — the single verdict frame a corpus
builder filters on.  The composition is where real pipelines break
(URL-grain misalignment between carriers), which is exactly what the
``admission_policy`` gate grades.

Reference analogy: hickory composes independent selector predicates
with ``and`` (select.cljc:434-440); this is the same conjunction shape
over independently-sourced page verdicts, lifted to DataFrames.

Pinned semantics (documented defaults, all opt-out):
- a URL with no robots.txt verdict row is crawlable;
- a URL with no header / meta row is indexable and followable;
- ``status >= 400`` blocks indexing (error bodies are not corpus
  text) but does not block following (redirect handling is
  ops/crawlgraph.resolve_redirects' job, not this frame's);
- ``index_ok`` / ``follow_ok`` imply ``crawl_ok`` — an uncrawlable
  page can never be indexed from a direct fetch;
- ``reason`` is the FIRST blocking signal in the pinned priority
  robots_disallow > http_error > http_noindex > meta_noindex,
  '' when indexable.

Scale shape: three left equi-joins on the url column.  All four
frames are url-keyed, so consecutive sort-merge joins reuse one
exchange per side (no re-partition between joins); small signal
frames broadcast under AQE.  No Python crossing, no windows, no
collects — pure JVM column expressions end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["admission_policy"]

#: blocking reasons in pinned priority order (first match wins)
REASONS = ("robots_disallow", "http_error", "http_noindex",
           "meta_noindex")


def _flag(df: DataFrame, col: str, out: str) -> DataFrame:
    return df.select("url", F.col(col).alias(out))


def admission_policy(
    pages: DataFrame,
    robots: DataFrame | None = None,
    http: DataFrame | None = None,
    meta: DataFrame | None = None,
) -> DataFrame:
    """pages(url, ...) x robots(url, allowed) x http(url, status,
    noindex, nofollow) x meta(url, noindex, nofollow) ->
    (url, crawl_ok, index_ok, follow_ok, reason).

    ``robots`` is ops/robots.robots_filter output, ``http`` is
    ops/http.x_robots_flags output, ``meta`` is
    ops/metadata.meta_robots_flags output restricted to the url grain;
    any of the three may be None (that carrier then never blocks).
    Inputs must be url-unique (they are, at their producers' grain);
    the joins are left joins so every page keeps exactly one verdict
    row."""
    out = pages.select("url")
    if robots is not None:
        out = out.join(_flag(robots, "allowed", "_allowed"), "url", "left")
    else:
        out = out.withColumn("_allowed", F.lit(None).cast("boolean"))
    if http is not None:
        out = out.join(
            http.select(
                "url",
                F.col("status").alias("_status"),
                F.col("noindex").alias("_h_ni"),
                F.col("nofollow").alias("_h_nf"),
            ),
            "url",
            "left",
        )
    else:
        out = (
            out.withColumn("_status", F.lit(None).cast("int"))
            .withColumn("_h_ni", F.lit(None).cast("boolean"))
            .withColumn("_h_nf", F.lit(None).cast("boolean"))
        )
    if meta is not None:
        out = out.join(
            meta.select(
                "url",
                F.col("noindex").alias("_m_ni"),
                F.col("nofollow").alias("_m_nf"),
            ),
            "url",
            "left",
        )
    else:
        out = out.withColumn(
            "_m_ni", F.lit(None).cast("boolean")
        ).withColumn("_m_nf", F.lit(None).cast("boolean"))

    crawl_ok = F.coalesce(F.col("_allowed"), F.lit(True))
    http_err = F.coalesce(F.col("_status") >= 400, F.lit(False))
    h_ni = F.coalesce(F.col("_h_ni"), F.lit(False))
    h_nf = F.coalesce(F.col("_h_nf"), F.lit(False))
    m_ni = F.coalesce(F.col("_m_ni"), F.lit(False))
    m_nf = F.coalesce(F.col("_m_nf"), F.lit(False))

    index_ok = crawl_ok & ~http_err & ~h_ni & ~m_ni
    follow_ok = crawl_ok & ~h_nf & ~m_nf
    reason = (
        F.when(~crawl_ok, F.lit("robots_disallow"))
        .when(http_err, F.lit("http_error"))
        .when(h_ni, F.lit("http_noindex"))
        .when(m_ni, F.lit("meta_noindex"))
        .otherwise(F.lit(""))
    )
    return out.select(
        "url",
        crawl_ok.alias("crawl_ok"),
        index_ok.alias("index_ok"),
        follow_ok.alias("follow_ok"),
        reason.alias("reason"),
    )
