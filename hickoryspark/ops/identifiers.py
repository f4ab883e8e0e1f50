"""Scholarly identifier extraction — DOI / arXiv / ISBN-13.

Science-corpus pipelines (papers, citation graphs, dataset linking)
key on persistent identifiers; this op scans text for the three
dominant schemes and validates what is checkable:

- **DOI** (doi.org handle syntax): ``10.<4-9 digits>/<suffix>`` with
  the suffix drawn from the registrant-safe class
  ``[-._;()/:A-Za-z0-9]``; up to one run of trailing sentence
  punctuation ``[.,;:)]`` is stripped (DOIs end mid-sentence
  constantly); always syntactically valid → ``valid`` = 1.
- **arXiv** (new-style 2007+ scheme): ``arXiv:YYMM.NNNNN`` with an
  optional ``vN``; the ``arXiv:`` prefix is case-SENSITIVE (the
  site's canonical citation form) and stripped from ``value``.
- **ISBN-13**: ``978``/``979`` plus ten more digits with optional
  single ``-``/space separators (word-bounded); ``value`` is the
  13-digit normalized form and ``valid`` carries the ISO 2108
  checksum (alternating 1/3 weights, Σ ≡ 0 mod 10).

Everything is JVM column work (regexp_extract_all + explode + a
13-term checksum sum — no Python, no shuffle) and every regex stays
in the Java ∩ RE2 subset (word boundaries + explicit classes, ``\\z``
never ``$``) so :func:`duckdb_identifiers_sql` mirrors it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_identifiers", "duckdb_identifiers_sql",
           "DOI_RE", "ARXIV_RE", "ISBN_RE"]

DOI_RE = r"10[.][0-9]{4,9}/[-._;()/:A-Za-z0-9]+"
ARXIV_RE = r"arXiv:[0-9]{4}[.][0-9]{4,5}(v[0-9]+)?"
ISBN_RE = r"\b97[89]([- ]?[0-9]){10}\b"
_DOI_TRIM = r"[.,;:)]+\z"

#: ISBN-13 weights (ISO 2108): 1,3 alternating over the 13 digits
_ISBN_W = [1 if i % 2 == 0 else 3 for i in range(13)]


def _isbn_checksum_ok(norm):
    total = None
    for i, w in enumerate(_ISBN_W):
        term = F.substring(norm, i + 1, 1).cast("int") * F.lit(w)
        total = term if total is None else total + term
    return (total % 10 == 0).cast("long")


def extract_identifiers(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """text → long rows ``(doc_id, kind, value, valid)``."""
    t = F.col(text_col)

    doi = docs.select(
        id_col,
        F.explode(F.regexp_extract_all(t, F.lit(DOI_RE), 0))
        .alias("raw"),
    ).select(
        id_col, F.lit("doi").alias("kind"),
        F.regexp_replace("raw", _DOI_TRIM, "").alias("value"),
        F.lit(1).cast("long").alias("valid"),
    )
    arxiv = docs.select(
        id_col,
        F.explode(F.regexp_extract_all(t, F.lit(ARXIV_RE), 0))
        .alias("raw"),
    ).select(
        id_col, F.lit("arxiv").alias("kind"),
        F.expr("substring(raw, 7)").alias("value"),
        F.lit(1).cast("long").alias("valid"),
    )
    norm = F.regexp_replace(F.col("raw"), r"[- ]", "")
    isbn = docs.select(
        id_col,
        F.explode(F.regexp_extract_all(t, F.lit(ISBN_RE), 0))
        .alias("raw"),
    ).select(
        id_col, F.lit("isbn13").alias("kind"),
        norm.alias("value"),
        _isbn_checksum_ok(norm).alias("valid"),
    )
    return doi.unionAll(arxiv).unionAll(isbn)


def duckdb_identifiers_sql(input_rel: str, text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    """DuckDB mirror over ``input_rel`` (same regexes, same trim,
    same checksum terms)."""
    terms = " + ".join(
        f"CAST(substring(v, {i + 1}, 1) AS INTEGER) * {w}"
        for i, w in enumerate(_ISBN_W))
    return f"""
        SELECT {id_col}, 'doi' AS kind,
               regexp_replace(u.x, '{_DOI_TRIM}', '') AS value,
               CAST(1 AS BIGINT) AS valid
        FROM {input_rel},
             unnest(regexp_extract_all({text_col}, '{DOI_RE}'))
               AS u(x)
        UNION ALL
        SELECT {id_col}, 'arxiv', substring(u.x, 7), CAST(1 AS BIGINT)
        FROM {input_rel},
             unnest(regexp_extract_all({text_col}, '{ARXIV_RE}'))
               AS u(x)
        UNION ALL
        SELECT {id_col}, 'isbn13', v,
               CAST(({terms}) % 10 = 0 AS BIGINT)
        FROM (
          SELECT {id_col}, regexp_replace(u.x, '[- ]', '', 'g') AS v
          FROM {input_rel},
               unnest(regexp_extract_all({text_col}, '{ISBN_RE}'))
                 AS u(x)
        )"""
