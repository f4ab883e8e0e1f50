"""URL canonicalization — the web-pipeline dedup key.

Crawls see the same page under many url spellings (case-varying
scheme/host, explicit default ports, tracking parameters, fragments,
trailing slashes). ``normalize_url`` folds those to one canonical
form with pure column expressions (whole-stage codegen, zero Python).
The regex pipeline uses only constructs shared by Spark (Java regex)
and DuckDB (RE2) — no lookaround, numbered groups only — so the
DuckDB oracle (``DUCKDB_NORMALIZE_SQL``) runs the identical program;
the two templates differ solely in backreference spelling ($1 vs \\1).

Normalization steps, in order:
1. lowercase the scheme://host prefix (path/query case is preserved)
2. drop an explicit default port (:443 on https, :80 on http)
3. drop the fragment (#...)
4. drop tracking query params (utm_*, fbclid, gclid), tidying the
   separators they leave behind; a now-empty '?' is dropped
5. drop one trailing slash (including the bare host-root slash)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"

#: ordered (pattern, spark_replacement) steps 2-5; DuckDB mirrors with
#: \N backrefs
_STEPS: list[tuple[str, str]] = [
    (r"^(https://[^/?#:]*):443($|[/?#].*)", "$1$2"),
    (r"^(http://[^/?#:]*):80($|[/?#].*)", "$1$2"),
    (r"#.*$", ""),
    # anchored at a real separator — an unanchored pattern would strip
    # lookalike substrings out of legitimate params ('msgclid=5') and
    # even path segments ('/utm_source=x/'), merging distinct pages
    # into one dedup key. The ()+ repetition eats CONSECUTIVE tracking
    # params in one match (scanning resumes after the replacement, so
    # back-to-back params would otherwise leave every second one).
    (r"([?&])((utm_[A-Za-z]+|fbclid|gclid)=[^&#]*&?)+", "$1"),
    (r"[?&]$", ""),
    (r"\?&", "?"),
    (r"^([^?#]*[^/?#])/(\?[^#]*)?$", "$1$2"),
]


def normalize_url(col: str | Column) -> Column:
    u = F.col(col) if isinstance(col, str) else col
    prefix = F.regexp_extract(u, _PREFIX_RE, 1)
    u = F.concat(F.lower(prefix), F.substring(u, F.length(prefix) + 1, F.length(u)))
    for pat, rep in _STEPS:
        u = F.regexp_replace(u, pat, rep)
    return u


def _duckdb_steps(expr: str) -> str:
    for pat, rep in _STEPS:
        # standard SQL single-quoted strings pass backslashes through
        # verbatim, so the Python pattern embeds as-is (no '' needed:
        # the patterns contain no quotes)
        rep_sql = rep.replace("$1", "\\1").replace("$2", "\\2")
        expr = f"regexp_replace({expr}, '{pat}', '{rep_sql}', 'g')"
    return expr


def duckdb_normalize_sql(u: str) -> str:
    """DuckDB expression computing the identical normalization of the
    url expression ``u`` (same steps, same patterns)."""
    prefix = f"regexp_extract({u}, '{_PREFIX_RE}', 1)"
    base = f"(lower({prefix}) || {u}[length({prefix}) + 1:])"
    return _duckdb_steps(base)


def url_dedup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Group rows by canonical url: (url_norm, n_variants, first_url)
    — the canonicalization-dedup pass of a crawl pipeline. One
    hash-groupBy; map-side partial agg."""
    return (
        df.select(
            normalize_url(url_col).alias("url_norm"),
            F.col(url_col).alias("u"),
        )
        .groupBy("url_norm")
        .agg(
            F.count("*").alias("n_variants"),
            F.min("u").alias("first_url"),
        )
    )
