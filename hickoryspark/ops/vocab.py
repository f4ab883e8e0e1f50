"""Corpus vocabulary statistics — the one-row rollup every corpus
datasheet carries: token/type counts, hapax mass, type-token ratio.

Built over ops/postings.term_stats (same tokenization, same df/cf
notions), so the numbers are consistent with the index the corpus
ships with.

Pinned exact-integer dialect (oracle-reproducible):

- ``n_docs`` counts input rows; ``n_tokens`` = sum(cf);
  ``n_types`` = distinct terms; ``n_hapax`` = terms with cf = 1;
  ``n_singleton_df`` = terms appearing in exactly one doc;
- ``ttr_milli = (1000 * n_types) div greatest(n_tokens, 1)`` and
  ``hapax_milli = (1000 * n_hapax) div greatest(n_types, 1)`` — the
  corpus-quality signals (a scraped corpus with collapsing TTR is
  boilerplate-heavy; exploding hapax mass is mojibake/OCR noise).

Scale shape: term_stats is one map-side-combinable aggregation; this
adds a second all-to-one rollup of the (small) term relation plus a
1-row count of docs — no windows, no joins beyond the final 1x1
cross, pure JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["vocab_stats", "duckdb_vocab_sql",
           "stopword_candidates", "duckdb_stopwords_sql"]


def vocab_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row: ``(n_docs, n_tokens, n_types, n_hapax,
    n_singleton_df, ttr_milli, hapax_milli)``."""
    from hickoryspark.ops.postings import term_stats

    terms = term_stats(docs, text_col)
    vocab = terms.agg(
        F.coalesce(F.sum("cf"), F.lit(0)).cast("long")
        .alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("cf") == 1).cast("long")).cast("long")
        .alias("n_hapax"),
        F.sum((F.col("df") == 1).cast("long")).cast("long")
        .alias("n_singleton_df"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        n_docs.crossJoin(F.broadcast(vocab))
        .select(
            "n_docs", "n_tokens", "n_types",
            F.coalesce("n_hapax", F.lit(0)).cast("long")
            .alias("n_hapax"),
            F.coalesce("n_singleton_df", F.lit(0)).cast("long")
            .alias("n_singleton_df"),
        )
        .withColumn(
            "ttr_milli",
            F.expr("(1000 * n_types) div greatest(n_tokens, 1)")
            .cast("long"),
        )
        .withColumn(
            "hapax_milli",
            F.expr("(1000 * n_hapax) div greatest(n_types, 1)")
            .cast("long"),
        )
    )


def duckdb_vocab_sql(docs_rel: str) -> str:
    """Full DuckDB mirror — same tokenization and arithmetic."""
    return f"""
        WITH occ AS (
          SELECT doc_id, t.term
          FROM {docs_rel}, unnest(list_filter(
            regexp_split_to_array(text, '{ASCII_WS_SPLIT_RE}'),
            s -> s != '')) AS t(term)),
        ts AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
                 CAST(COUNT(*) AS BIGINT) AS cf
          FROM occ GROUP BY term),
        v AS (
          SELECT CAST(COALESCE(SUM(cf), 0) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(COALESCE(SUM(CASE WHEN cf = 1 THEN 1 END), 0)
                      AS BIGINT) AS n_hapax,
                 CAST(COALESCE(SUM(CASE WHEN df = 1 THEN 1 END), 0)
                      AS BIGINT) AS n_singleton_df
          FROM ts),
        ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
                  FROM {docs_rel})
        SELECT n_docs, n_tokens, n_types, n_hapax, n_singleton_df,
               CAST((1000 * n_types) // greatest(n_tokens, 1)
                    AS BIGINT) AS ttr_milli,
               CAST((1000 * n_hapax) // greatest(n_types, 1)
                    AS BIGINT) AS hapax_milli
        FROM ndocs, v"""


def stopword_candidates(docs: DataFrame, text_col: str = "text",
                        min_df_milli: int = 500) -> DataFrame:
    """Corpus-specific stopword induction: ``(term, df, cf,
    df_milli)`` for every term present in at least ``min_df_milli``
    per-mille of all docs (``df * 1000 >= min_df_milli * n_docs``),
    ``df_milli = (1000 * df) div n_docs``.

    THRESHOLD-based on purpose — a global top-k rank of the vocab
    would funnel the whole term relation through one task; the df
    cut is a map-side filter against one broadcast scalar."""
    from hickoryspark.ops.postings import term_stats

    terms = term_stats(docs, text_col)
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        terms.crossJoin(F.broadcast(n_docs))
        .where(F.col("df") * 1000 >= int(min_df_milli)
               * F.col("n_docs"))
        .select(
            "term", "df", "cf",
            F.expr("(1000 * df) div n_docs").cast("long")
            .alias("df_milli"),
        )
    )


def duckdb_stopwords_sql(docs_rel: str, min_df_milli: int = 500) -> str:
    """Full DuckDB mirror of :func:`stopword_candidates`."""
    return f"""
        WITH occ AS (
          SELECT doc_id, t.term
          FROM {docs_rel}, unnest(list_filter(
            regexp_split_to_array(text, '{ASCII_WS_SPLIT_RE}'),
            s -> s != '')) AS t(term)),
        ts AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
                 CAST(COUNT(*) AS BIGINT) AS cf
          FROM occ GROUP BY term),
        ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
                  FROM {docs_rel})
        SELECT term, df, cf,
               CAST((1000 * df) // n_docs AS BIGINT) AS df_milli
        FROM ts, ndocs
        WHERE df * 1000 >= {int(min_df_milli)} * n_docs"""
