"""Bitext candidate mining over the hreflang alternate graph.

Parallel-corpus builders (ParaCrawl / CCMatrix / CCAligned style)
start from WITHIN-SITE alignment candidates: a page's hreflang
alternate list names the same content in k languages, so every
unordered pair of alternates with distinct language tags is a
candidate (document-level) translation pair. This operator forms
those pairs and scores them with the two cheap alignment signals
every such pipeline computes before expensive sentence alignment:
length ratio and shared-number overlap (numbers survive
translation verbatim — Resnik & Smith 2003's STRAND cue).

Pinned semantics (relational core mirrored in DuckDB):

- Pairs come from ONE listing page: alternates ``a``, ``b`` of the
  same ``url`` with ``lower(hreflang)`` differing; pair orientation
  is canonical ``lang_a < lang_b`` (langs lowercased; strict order —
  equal langs are dropped, the mobile/x-default duplicate case);
  pairs are DISTINCT over (lang_a, url_a, lang_b, url_b) across all
  listing pages (every alternate lists the full cluster, so the same
  pair appears once per cluster member).
- Pair endpoints are ops/urls.normalize_url over extract_hreflang's
  ``resolved`` (the hreflang_symmetry convention); ``pages`` urls are
  normalized the same way, and only pairs whose BOTH endpoints have a
  text row survive (inner joins — an unfetched alternate is not a
  candidate).
- Signals, exact integers (hash-stable BIGINT):
  ``len_a``/``len_b`` = char length of the text;
  ``len_ratio_milli`` = 1000 * least(len) // greatest(len)
  (1000 when both are 0);
  ``num_jaccard_milli`` = 1000 * |Na ∩ Nb| // |Na ∪ Nb| over the
  DISTINCT ASCII digit-run token sets (string-wise: '007' != '7';
  1000 when both sets are empty).

Scale shape: the pair build is a url-LOCAL self-join (same equi key,
one shuffle family), then one distinct on the pair key, then two url
equi-joins against pages — each broadcastable when the text side is
the big one. No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bitext_pairs_from_alts",
    "bitext_candidates",
    "duckdb_bitext_sql",
    "DEFAULT_ALT_CAP",
]

_NUM_RE = "[0-9]+"

#: per-listing-page alternate cap — hreflang lists are legitimately
#: large (one per locale) but a hostile page with 50k alternates
#: would otherwise funnel ~k²/2 self-join rows through ONE url task
#: (the tables/hosts/postings cap discipline). Alternates beyond the
#: cap (by alt_pos) are ignored.
DEFAULT_ALT_CAP = 128


def _num_set(text_col) -> "F.Column":
    return F.array_distinct(F.regexp_extract_all(text_col,
                                                 F.lit(_NUM_RE), 0))


def bitext_pairs_from_alts(alts: DataFrame,
                           pages: DataFrame,
                           alt_cap: int | None = DEFAULT_ALT_CAP
                           ) -> DataFrame:
    """Relational core: ``alts`` must expose
    ``(url, alt_pos, lang, target)`` (lang already lowercased, target
    already canonical), ``pages`` must expose ``(url, text)`` with
    urls in the same canonical form. Returns
    ``(url_a, lang_a, url_b, lang_b, len_a, len_b, len_ratio_milli,
    num_jaccard_milli)``. ``alt_cap`` bounds the per-page self-join
    (see DEFAULT_ALT_CAP); None disables the cap."""
    if alt_cap is not None:
        alts = alts.where(F.col("alt_pos") <= alt_cap)
    a = alts.select("url", F.col("alt_pos").alias("pa"),
                    F.col("lang").alias("la"),
                    F.col("target").alias("ta"))
    b = alts.select("url", F.col("alt_pos").alias("pb"),
                    F.col("lang").alias("lb"),
                    F.col("target").alias("tb"))
    raw = a.join(b, "url").where(
        (F.col("pa") < F.col("pb")) & (F.col("la") != F.col("lb")))
    # canonical orientation by language tag (strict: langs differ)
    pairs = raw.select(
        F.when(F.col("la") < F.col("lb"), F.col("la"))
        .otherwise(F.col("lb")).alias("lang_a"),
        F.when(F.col("la") < F.col("lb"), F.col("ta"))
        .otherwise(F.col("tb")).alias("url_a"),
        F.when(F.col("la") < F.col("lb"), F.col("lb"))
        .otherwise(F.col("la")).alias("lang_b"),
        F.when(F.col("la") < F.col("lb"), F.col("tb"))
        .otherwise(F.col("ta")).alias("url_b"),
    ).distinct()

    pa = pages.select(F.col("url").alias("url_a"),
                      F.col("text").alias("text_a"))
    pb = pages.select(F.col("url").alias("url_b"),
                      F.col("text").alias("text_b"))
    j = pairs.join(pa, "url_a").join(pb, "url_b")

    na = _num_set(F.col("text_a"))
    nb = _num_set(F.col("text_b"))
    feat = j.select(
        "url_a", "lang_a", "url_b", "lang_b",
        F.length("text_a").cast("long").alias("len_a"),
        F.length("text_b").cast("long").alias("len_b"),
        F.size(F.array_intersect(na, nb)).cast("long").alias("inter"),
        F.size(F.array_union(na, nb)).cast("long").alias("uni"),
    )
    return feat.select(
        "url_a", "lang_a", "url_b", "lang_b", "len_a", "len_b",
        F.when(F.greatest("len_a", "len_b") == 0,
               F.lit(1000).cast("long"))
        .otherwise(F.expr(
            "least(len_a, len_b) * 1000 div greatest(len_a, len_b)"))
        .alias("len_ratio_milli"),
        F.when(F.col("uni") == 0, F.lit(1000).cast("long"))
        .otherwise(F.expr("inter * 1000 div uni"))
        .alias("num_jaccard_milli"),
    )


def bitext_candidates(nodes: DataFrame, pages: DataFrame,
                      alt_cap: int | None = DEFAULT_ALT_CAP
                      ) -> DataFrame:
    """End-to-end: hreflang alternates from the node table
    (ops/metadata.extract_hreflang), endpoints + page urls
    canonicalized with ops/urls.normalize_url, then the relational
    core. ``pages`` must expose ``(url, text)``."""
    from hickoryspark.ops.metadata import extract_hreflang
    from hickoryspark.ops.urls import normalize_url

    alts = extract_hreflang(nodes).select(
        "url", "alt_pos",
        F.lower(F.col("hreflang")).alias("lang"),
        normalize_url(F.col("resolved")).alias("target"),
    )
    canon_pages = pages.select(
        normalize_url(F.col("url")).alias("url"), "text")
    return bitext_pairs_from_alts(alts, canon_pages, alt_cap=alt_cap)


def duckdb_bitext_sql(alts_rel: str, pages_rel: str) -> str:
    """Full DuckDB mirror of :func:`bitext_pairs_from_alts` —
    ``alts_rel`` exposes (url, alt_pos, lang, target), ``pages_rel``
    exposes (url, text)."""
    nums = "list_distinct(regexp_extract_all({t}, '[0-9]+'))"
    na = nums.format(t="pa.text")
    nb = nums.format(t="pb.text")
    return f"""
        WITH raw AS (
          SELECT a.lang AS la, a.target AS ta,
                 b.lang AS lb, b.target AS tb
          FROM {alts_rel} a JOIN {alts_rel} b ON a.url = b.url
          WHERE a.alt_pos < b.alt_pos AND a.lang <> b.lang),
        pairs AS (
          SELECT DISTINCT
            CASE WHEN la < lb THEN la ELSE lb END AS lang_a,
            CASE WHEN la < lb THEN ta ELSE tb END AS url_a,
            CASE WHEN la < lb THEN lb ELSE la END AS lang_b,
            CASE WHEN la < lb THEN tb ELSE ta END AS url_b
          FROM raw),
        j AS (
          SELECT p.url_a, p.lang_a, p.url_b, p.lang_b,
                 CAST(length(pa.text) AS BIGINT) AS len_a,
                 CAST(length(pb.text) AS BIGINT) AS len_b,
                 len(list_filter({na},
                     x -> list_contains({nb}, x))) AS inter,
                 len({na}) + len({nb})
                   - len(list_filter({na},
                         x -> list_contains({nb}, x))) AS uni
          FROM pairs p
          JOIN {pages_rel} pa ON p.url_a = pa.url
          JOIN {pages_rel} pb ON p.url_b = pb.url)
        SELECT url_a, lang_a, url_b, lang_b, len_a, len_b,
               CAST(CASE WHEN greatest(len_a, len_b) = 0 THEN 1000
                    ELSE least(len_a, len_b) * 1000
                         // greatest(len_a, len_b) END
                    AS BIGINT) AS len_ratio_milli,
               CAST(CASE WHEN uni = 0 THEN 1000
                    ELSE inter * 1000 // uni END
                    AS BIGINT) AS num_jaccard_milli
        FROM j"""
