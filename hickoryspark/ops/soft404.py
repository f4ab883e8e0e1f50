"""Soft-404 detection — pages that return HTTP 200 but are error
pages in substance. Crawlers that miss them index junk, waste revisit
budget, and poison link-graph signals (every dead permalink on a site
funnels into one "not found" template that then looks like a hot
page).

The classic treatment (Bar-Yossef et al., "Sic transit gloria telae",
WWW 2004) probes sites with known-bogus URLs; that needs live
fetches. This is the content-side heuristic a batch pipeline can run:
a pinned, oracle-reproducible rule over signals the corpus already
carries.

Pinned semantics:

- ``title_404``: the title matches the error-phrase pattern
  (:data:`ERROR_PHRASE_RE`, ASCII-case-insensitive, substring);
- ``phrase_hit``: the body text matches the same pattern;
- ``thin``: fewer than ``thin_tokens`` (default 20) ASCII-whitespace
  tokens in the body;
- ``is_soft404`` = ``status == 200`` AND (``title_404`` OR
  (``phrase_hit`` AND ``thin``)) — a long article QUOTING "not
  found" is not an error page, so the body phrase alone only counts
  on thin pages; a real 404 status is not a SOFT 404 (the header
  already tells the truth);
- NULL title/text behave as empty; NULL status never equals 200.

Scale shape: pure JVM column expressions — no shuffle, no Python, one
regex pass over title and text each. The DuckDB mirror is GENERATED
from the same pattern (RE2 ∩ Java-regex subset: alternation +
explicit ASCII case classes, no case flags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

# single-sourced in ops/asciire.py (promoted there once paywall and
# techstack needed it too); kept under the old name for importers
from hickoryspark.ops.asciire import ascii_ci_phrase as _ascii_ci

__all__ = ["soft404_signals", "duckdb_soft404_sql", "ERROR_PHRASE_RE",
           "DEFAULT_THIN_TOKENS"]

#: error-page phrases (substring match, ASCII-case-insensitive)
ERROR_PHRASES = (
    "page not found", "not be found", "404", "no longer available",
    "does not exist", "page unavailable",
)


#: generated pattern, shared verbatim with the DuckDB mirror —
#: RE2 ∩ Java subset with NO case flags
ERROR_PHRASE_RE = "(" + "|".join(_ascii_ci(p) for p in ERROR_PHRASES) + ")"

DEFAULT_THIN_TOKENS = 20


def soft404_signals(df: DataFrame, status_col: str = "status",
                    title_col: str = "title", text_col: str = "text",
                    thin_tokens: int = DEFAULT_THIN_TOKENS) -> DataFrame:
    """Adds ``n_tokens, title_404, phrase_hit, thin, is_soft404`` to
    ``df`` (any grain carrying the three signal columns)."""
    title = F.coalesce(F.col(title_col), F.lit(""))
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_tokens = F.size(
        F.filter(F.split(text, ASCII_WS_SPLIT_RE), lambda t: t != "")
    ).cast("long")
    title_404 = title.rlike(ERROR_PHRASE_RE)
    phrase_hit = text.rlike(ERROR_PHRASE_RE)
    thin = F.col("n_tokens") < thin_tokens
    is200 = F.coalesce(F.col(status_col) == 200, F.lit(False))
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("title_404", title_404)
        .withColumn("phrase_hit", phrase_hit)
        .withColumn("thin", thin)
        .withColumn(
            "is_soft404",
            is200 & (F.col("title_404")
                     | (F.col("phrase_hit") & F.col("thin"))),
        )
    )


def duckdb_soft404_sql(status: str = "status", title: str = "title",
                       text: str = "text",
                       thin_tokens: int = DEFAULT_THIN_TOKENS) -> str:
    """Mirror expression list computing the five signal columns (same
    pattern, same NULL handling); splice into a SELECT."""
    t = f"COALESCE({title}, '')"
    x = f"COALESCE({text}, '')"
    n = (f"CAST(len(list_filter(regexp_split_to_array({x}, "
         f"'{ASCII_WS_SPLIT_RE}'), s -> s != '')) AS BIGINT)")
    t404 = f"regexp_matches({t}, '{ERROR_PHRASE_RE}')"
    hit = f"regexp_matches({x}, '{ERROR_PHRASE_RE}')"
    return f"""{n} AS n_tokens,
        {t404} AS title_404,
        {hit} AS phrase_hit,
        {n} < {thin_tokens} AS thin,
        (COALESCE({status} = 200, FALSE) AND ({t404}
          OR ({hit} AND {n} < {thin_tokens}))) AS is_soft404"""
