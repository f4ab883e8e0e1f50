"""Web technology fingerprinting (Wappalyzer-style, pinned rule
subset): which CMS / JS framework / analytics stack a page runs,
detected from three carriers — ``meta[name=generator]`` content,
``script[src]`` URLs, and ``link[href]`` URLs. A crawl-analytics
staple (corpus composition by platform, spam-farm template spotting,
crawler politeness tuning per CMS).

Rules are PLAN-TIME literals (:data:`TECH_RULES` — (tech, carrier,
needle), needle matched as an ASCII-case-insensitive substring via
generated per-letter classes, never ``(?i)``: the soft404 lesson —
Java folds ASCII-only while RE2 folds Unicode, so an inline flag lets
the engines disagree). The whole rule set compiles to ONE
array-of-whens + explode per carrier row — no join, whole-stage
codegen, and the only exchange is the final (url, tech) rollup.

The DuckDB mirror (:func:`duckdb_tech_sql`) is GENERATED from the
same rule list (the psl.py pattern), one UNION ALL arm per rule over
the same carriers relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT
from hickoryspark.ops.asciire import ascii_ci_literal as _ci_substr_re

__all__ = ["TECH_RULES", "detect_tech", "tech_from_carriers",
           "duckdb_tech_sql"]

#: (tech, carrier, needle) — carrier in {generator, script, link};
#: needles are ASCII, matched case-insensitively as substrings.
TECH_RULES = (
    ("wordpress", "generator", "wordpress"),
    ("wordpress", "script", "wp-content"),
    ("wordpress", "link", "wp-content"),
    ("drupal", "generator", "drupal"),
    ("joomla", "generator", "joomla"),
    ("shopify", "script", "cdn.shopify.com"),
    ("shopify", "link", "cdn.shopify.com"),
    ("jquery", "script", "jquery"),
    ("react", "script", "react"),
    ("angular", "script", "angular"),
    ("bootstrap", "script", "bootstrap"),
    ("bootstrap", "link", "bootstrap"),
    ("gatsby", "generator", "gatsby"),
    ("hugo", "generator", "hugo"),
    ("nextjs", "script", "/_next/"),
    ("google-analytics", "script", "google-analytics.com"),
    ("google-analytics", "script", "googletagmanager"),
)


_GENERATOR_NAME_RE = "\\A" + _ci_substr_re("generator") + "\\z"


def tech_from_carriers(carriers: DataFrame) -> DataFrame:
    """(url, tech, n_signals) from carrier rows (url, carrier,
    value): every rule whose needle appears (ASCII-ci) in a matching
    carrier's value contributes one signal; NULL values never match.
    One map-side pass + one (url, tech) rollup."""
    val = F.col("value")
    car = F.col("carrier")
    hits = F.array_compact(F.array(*[
        F.when((car == k) & val.rlike(_ci_substr_re(n)), F.lit(t))
        for t, k, n in TECH_RULES
    ]))
    return (
        carriers.where(val.isNotNull())
        .select("url", F.explode(hits).alias("tech"))
        .groupBy("url", "tech")
        .agg(F.count(F.lit(1)).cast("long").alias("n_signals"))
    )


def detect_tech(nodes: DataFrame) -> DataFrame:
    """Node table -> (url, tech, n_signals): extracts the three
    carriers (meta generator / script src / link href) and applies
    :func:`tech_from_carriers`. Carrier extraction is a pruned
    map-side scan; the rollup is the only exchange."""
    attrs = F.col("attrs")
    tag = F.col("tag")
    carrier = (
        F.when((tag == "meta")
               & F.coalesce(attrs["name"], F.lit(""))
               .rlike(_GENERATOR_NAME_RE),
               F.lit("generator"))
        .when(tag == "script", F.lit("script"))
        .when(tag == "link", F.lit("link")))
    value = (
        F.when(carrier == "generator", attrs["content"])
        .when(carrier == "script", attrs["src"])
        .when(carrier == "link", attrs["href"]))
    rows = (
        nodes.where(F.col("type") == TYPE_ELEMENT)
        .select("url", carrier.alias("carrier"), value.alias("value"))
        .where(F.col("carrier").isNotNull()
               & F.col("value").isNotNull()))
    return tech_from_carriers(rows)


def duckdb_tech_sql(carriers_rel: str) -> str:
    """DuckDB mirror of :func:`tech_from_carriers` over a relation
    exposing (url, carrier, value) — one UNION ALL arm per rule,
    generated from the SAME :data:`TECH_RULES`."""
    arms = []
    for t, k, n in TECH_RULES:
        # DuckDB '...' literals are raw (no backslash processing) —
        # only quotes need doubling; the backslash reaches RE2 as-is.
        pat = _ci_substr_re(n).replace("'", "''")
        arms.append(
            f"SELECT url, '{t}' AS tech FROM {carriers_rel}"
            f" WHERE carrier = '{k}' AND value IS NOT NULL"
            f" AND regexp_matches(value, '{pat}')")
    u = " UNION ALL ".join(arms)
    return (f"SELECT url, tech, CAST(COUNT(*) AS BIGINT) AS n_signals"
            f" FROM ({u}) tech_hits GROUP BY url, tech")
