"""URL template mining — crawler-trap and infinite-space detection.

Calendars, session-id paths, faceted search, and pagination generate
unbounded URL families a crawler must recognize BEFORE fetching
(UbiCrawler and IRLbot both ship such detectors; Common Crawl's
fetch-politeness stack prunes on the same signal). The detector folds
each URL to a TEMPLATE SIGNATURE — variable path segments classified,
query parameter values dropped — then rolls up per signature: a
signature with variable segments backing many URLs is a trap
candidate, and `frontier admission` caps or drops its family.

Pinned signature rules (oracle-reproducible, shared regex program):

- path split on ``/``, empty segments dropped;
- a segment that is ALL digits -> ``{d}``;
- a segment of 8+ lowercase-hex chars (after lowering; id-like:
  md5/sha/uuid-sans-dash prefixes) -> ``{x}``;
- any other segment keeps its text with embedded digit RUNS folded to
  ``{n}`` (``page12.html`` == ``page7.html``);
- query: parameter NAMES only (text before the first ``=``), sorted,
  comma-joined after ``?``; no query -> no ``?`` suffix;
- signature = folded host (ops/hosts rules) + ``/`` + template path
  (+ query suffix). URLs with no authority get a NULL host and group
  under their bare template path.

Scale shape: pure column expressions + ONE groupBy on the signature —
map-side combine collapses each partition to its distinct-signature
set, which is exactly the small thing trap mining exists to produce;
a mega-family (the trap itself) combines to one row per partition
before the shuffle, so the skew never travels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.urls import _PATH_RE, _QUERY_RE, _UNSAFE_RE

__all__ = ["url_template_signature", "url_templates",
           "duckdb_url_template_sql", "TRAP_MIN_URLS"]

#: default family size at which a variable signature is flagged
TRAP_MIN_URLS = 100

# \z, never $ — Java-$ matches before a trailing newline, RE2-$
# doesn't (CLAUDE.md URL-pattern invariant); segments are post-strip
# but the rule is unconditional for shared patterns
_DIGIT_SEG = r"^[0-9]+\z"
_HEX_SEG = r"^[0-9a-f]{8,}\z"
#: scheme-qualified absolute URL (authority present)
_ABS_RE = r"(?i)^[a-z][a-z0-9+.-]*://"
_REL_PATH_RE = r"^([^?#]*)"
_REL_QUERY_RE = r"^[^?#]*\?([^#]*)"
_DIGIT_RUN = r"[0-9]+"


def _classify_seg(s: Column) -> Column:
    return (
        F.when(s.rlike(_DIGIT_SEG), F.lit("{d}"))
        .when(F.lower(s).rlike(_HEX_SEG), F.lit("{x}"))
        .otherwise(F.regexp_replace(s, _DIGIT_RUN, "{n}"))
    )


def url_template_signature(url: Column) -> Column:
    """The template signature for an absolute URL column."""
    from hickoryspark.ops.hosts import url_host

    u = F.regexp_replace(url, _UNSAFE_RE, "")
    is_abs = u.rlike(_ABS_RE)
    path = F.when(is_abs, F.regexp_extract(u, _PATH_RE, 1)).otherwise(
        F.regexp_extract(u, _REL_PATH_RE, 1))
    query = F.when(is_abs, F.regexp_extract(u, _QUERY_RE, 1)).otherwise(
        F.regexp_extract(u, _REL_QUERY_RE, 1))
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    tpl_path = F.array_join(F.transform(segs, _classify_seg), "/")
    names = F.array_sort(F.transform(
        F.filter(F.split(query, "&"), lambda p: p != ""),
        lambda p: F.substring_index(p, "=", 1),
    ))
    qsuf = F.when(F.size(names) > 0,
                  F.concat(F.lit("?"), F.array_join(names, ","))
                  ).otherwise(F.lit(""))
    return F.concat(F.coalesce(url_host(u), F.lit("")),
                    F.lit("/"), tpl_path, qsuf)


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    trap_min_urls: int = TRAP_MIN_URLS,
) -> DataFrame:
    """Per-signature rollup: ``(host, signature, n_urls,
    n_distinct_urls, is_variable, is_trap)``.

    ``is_variable``: the template contains a folded marker (at least
    one ``{d}``/``{x}``/``{n}`` or a query suffix) — a static page
    family can be large without being a trap. ``is_trap`` =
    is_variable AND n_urls >= trap_min_urls."""
    from hickoryspark.ops.hosts import url_host

    u = F.regexp_replace(F.col(url_col), _UNSAFE_RE, "")
    sig = url_template_signature(F.col(url_col))
    rolled = (
        df.select(url_host(u).alias("host"), sig.alias("signature"),
                  F.col(url_col).alias("_u"))
        .groupBy("host", "signature")
        .agg(F.count(F.lit(1)).alias("n_urls"),
             F.countDistinct("_u").alias("n_distinct_urls"))
    )
    is_var = (F.col("signature").rlike(r"\{[dxn]\}")
              | F.col("signature").contains("?"))
    return rolled.select(
        "host", "signature",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_distinct_urls").cast("long").alias("n_distinct_urls"),
        is_var.alias("is_variable"),
        (is_var & (F.col("n_urls") >= trap_min_urls)).alias("is_trap"),
    )


def duckdb_url_template_sql(u: str) -> str:
    """DuckDB expression mirroring :func:`url_template_signature`
    (same regex program; list_transform/list_sort counterparts)."""
    from hickoryspark.ops.hosts import _HOST_RE

    u = f"regexp_replace({u}, '{_UNSAFE_RE}', '', 'g')"
    hraw = (
        f"regexp_replace(lower(regexp_extract({u}, '{_HOST_RE}', 1)), "
        f"'\\.\\z', '')"
    )
    is_abs = f"regexp_matches({u}, '{_ABS_RE}')"
    path = (
        f"CASE WHEN {is_abs} THEN regexp_extract({u}, '{_PATH_RE}', 1) "
        f"ELSE regexp_extract({u}, '{_REL_PATH_RE}', 1) END"
    )
    query = (
        f"CASE WHEN {is_abs} THEN regexp_extract({u}, '{_QUERY_RE}', 1) "
        f"ELSE regexp_extract({u}, '{_REL_QUERY_RE}', 1) END"
    )
    seg = (
        "CASE WHEN regexp_matches(s, '" + _DIGIT_SEG + "') THEN '{d}' "
        "WHEN regexp_matches(lower(s), '" + _HEX_SEG + "') THEN '{x}' "
        "ELSE regexp_replace(s, '" + _DIGIT_RUN + "', '{n}', 'g') END"
    )
    # COALESCE: DuckDB array_to_string([]) is NULL, Spark array_join
    # on an empty array is ''
    tpl = (
        f"COALESCE(array_to_string(list_transform(list_filter("
        f"string_split({path}, '/'), s -> s != ''), s -> {seg}), '/'), '')"
    )
    names = (
        f"list_sort(list_transform(list_filter("
        f"string_split({query}, '&'), p -> p != ''), "
        f"p -> string_split(p, '=')[1]))"
    )
    qsuf = (
        f"CASE WHEN len({names}) > 0 "
        f"THEN '?' || array_to_string({names}, ',') ELSE '' END"
    )
    return (
        f"(COALESCE(CASE WHEN {hraw} != '' THEN {hraw} END, '') "
        f"|| '/' || {tpl} || {qsuf})"
    )
