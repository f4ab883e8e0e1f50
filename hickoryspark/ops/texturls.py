"""Plain-text URL harvesting — frontier seeds from unparsed text.

Crawl frontiers feed on more than ``<a href>`` edges: forum posts,
plain-text citations, WET conversion records, and README-style
documents carry absolute URLs that the HTML link extractor
(ops/links.py) never sees because there is no markup around them.
This op scans free text for ``http``/``https`` URLs, trims the
sentence punctuation that text embeds them in, and canonicalizes the
survivors with the SAME :func:`hickoryspark.ops.urls.normalize_url`
program the href path uses — so a URL harvested from text and the
same URL harvested from an href dedup to one frontier key.

Reference scope: hickory's universe starts at ``parse``
(core.clj:150) — it has no text-level extractor; this is web-scale
frontier tooling layered on the graft, the text-side twin of
``extract_links``.

Pinned extraction rule (shared verbatim with the DuckDB mirror):

- a URL is ``http``/``https`` (any case, explicit case classes —
  never ``(?i)``, which folds differently between Java and RE2) +
  ``://`` + a maximal run of characters excluding ASCII controls,
  space, ``<``, ``>``, ``"`` and DEL;
- up to one trailing run of sentence punctuation ``.,;:!?)]'"`` is
  stripped (URLs end mid-sentence constantly); punctuation INSIDE
  the run survives (``/x,y`` keeps its comma);
- ``pos`` is the 1-based match index within the document.

Everything is JVM column work — one ``regexp_extract_all`` +
``posexplode``, no Python, no shuffle (plan-guarded in tests). All
patterns stay in the Java-regex ∩ RE2 subset: explicit control-char
classes (never ``\\s`` — the two engines disagree on U+000B), ``\\z``
never ``$``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.hosts import duckdb_url_host_sql, url_host
from hickoryspark.ops.urls import duckdb_normalize_sql, normalize_url

__all__ = ["harvest_urls", "url_mentions", "duckdb_harvest_sql",
           "duckdb_mentions_sql", "URL_RE", "TRAIL_RE"]

#: maximal printable run after an explicit-case http(s) scheme.
#: Excluded: ASCII controls (covers \t\n\r — URL-splitting whitespace),
#: space, the HTML-ish delimiters < > ", and DEL.
URL_RE = r'[Hh][Tt][Tt][Pp][Ss]?://[^\x00-\x20<>"\x7f]+'

#: trailing sentence punctuation trimmed from a match (anchored \z —
#: Java's $ matches before a final newline, RE2's does not)
TRAIL_RE = r"[.,;:!?)\]'\x22]+\z"


def harvest_urls(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """text → ``(doc_id, pos, url, norm_url, host)``, one row per
    harvested URL in document order.

    ``url`` is the trimmed literal match; ``norm_url`` its
    canonical form (frontier dedup key); ``host`` the WHATWG-folded
    authority of the canonical form. Zero-URL documents contribute
    no rows (plain explode).
    """
    t = F.col(text_col)
    rows = docs.select(
        id_col,
        F.posexplode(F.regexp_extract_all(t, F.lit(URL_RE), 0))
        .alias("_p", "_raw"),
    ).select(
        id_col,
        (F.col("_p") + 1).cast("long").alias("pos"),
        F.regexp_replace("_raw", TRAIL_RE, "").alias("url"),
    )
    norm = normalize_url(F.col("url"))
    return rows.select(
        id_col, "pos", "url",
        norm.alias("norm_url"),
        url_host(norm).alias("host"),
    )


def url_mentions(harvested: DataFrame) -> DataFrame:
    """Harvest rows → per-canonical-url mention rollup
    ``(norm_url, n_mentions, n_docs, first_doc)`` — the seed-ranking
    input (mention count ~ prior crawl value). ONE hash groupBy with
    map-side partial aggregation; no window, no distinct pass
    (``n_docs`` is an exact count_distinct inside the same agg)."""
    return (
        harvested.groupBy("norm_url")
        .agg(
            F.count("*").cast("long").alias("n_mentions"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")


def duckdb_harvest_sql(input_rel: str, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`harvest_urls` over ``input_rel`` —
    same match pattern, same trim, the IMPORTED normalize + host
    mirrors (single source, no lockstep copy)."""
    norm = duckdb_normalize_sql("url")
    host = duckdb_url_host_sql("norm_url")
    return f"""
        WITH m AS (
          SELECT {id_col},
                 unnest(regexp_extract_all({text_col},
                        '{_sql_quote(URL_RE)}')) AS raw,
                 generate_subscripts(regexp_extract_all({text_col},
                        '{_sql_quote(URL_RE)}'), 1) AS p
          FROM {input_rel}
        ), trimmed AS (
          SELECT {id_col}, CAST(p AS BIGINT) AS pos,
                 regexp_replace(raw, '{_sql_quote(TRAIL_RE)}', '')
                   AS url
          FROM m
        ), canon AS (
          SELECT {id_col}, pos, url, {norm} AS norm_url FROM trimmed
        )
        SELECT {id_col}, pos, url, norm_url, {host} AS host
        FROM canon"""


def duckdb_mentions_sql(input_rel: str, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB mirror of ``url_mentions(harvest_urls(...))``."""
    inner = duckdb_harvest_sql(input_rel, text_col, id_col)
    return f"""
        SELECT norm_url, CAST(COUNT(*) AS BIGINT) AS n_mentions,
               CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS n_docs,
               CAST(MIN({id_col}) AS BIGINT) AS first_doc
        FROM ({inner}) h
        GROUP BY norm_url"""
