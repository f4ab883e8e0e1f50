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


def cocitation_pairs(
    ids: DataFrame,
    min_count: int = 2,
    per_doc_cap: int = 64,
) -> DataFrame:
    """Co-citation analysis (Small, JASIS 1973): two identifiers are
    co-cited when one document mentions both; the pair count across
    the corpus is the classic relatedness signal bibliometrics and
    citation-graph builders consume.

    Input is :func:`extract_identifiers` rows; only ``valid`` ids
    participate, per-doc values are DISTINCT (a doc repeating a DOI
    is one citation), and each doc contributes at most
    ``per_doc_cap`` ids (first by value — the bounded-frames rule: a
    hostile reference-list page must not fan out quadratically).
    Pairs are unordered (``id_a < id_b``, ASCII contract).

    Scale shape: the per-doc cap window partitions on doc_id (frames
    bounded by ids-per-doc), the pair self-join is doc_id-equi with
    the cap bounding its fan-out, and the count is one aggregation
    with map-side combine.
    """
    from pyspark.sql.window import Window

    di = (
        ids.where(F.col("valid") == 1)
        .select("doc_id", "value")
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("value")
    capped = (
        di.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= per_doc_cap)
        .drop("_rk")
    )
    a = capped.select(F.col("doc_id"), F.col("value").alias("id_a"))
    b = capped.select(
        F.col("doc_id").alias("_bd"), F.col("value").alias("id_b")
    )
    return (
        a.join(b, (a["doc_id"] == b["_bd"]) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_count)
    )


def duckdb_cocitation_sql(
    ids_sql: str, min_count: int = 2, per_doc_cap: int = 64
) -> str:
    """Mirror composed over a duckdb_identifiers_sql body."""
    return f"""
        WITH ids AS ({ids_sql}),
        di AS (SELECT DISTINCT doc_id, value FROM ids WHERE valid = 1),
        cap AS (SELECT doc_id, value FROM (
                  SELECT doc_id, value,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY value) AS rk
                  FROM di) WHERE rk <= {per_doc_cap})
        SELECT a.value AS id_a, b.value AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM cap a JOIN cap b
          ON a.doc_id = b.doc_id AND a.value < b.value
        GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}"""
