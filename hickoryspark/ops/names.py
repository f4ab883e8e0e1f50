"""Proper-noun candidate mining — runs of capitalized tokens.

The cheap NER pre-pass training-data pipelines run at corpus scale:
multi-token capitalized spans are overwhelmingly names (people,
places, orgs, titles); the candidate table feeds anonymization
audits, entity-frequency stats, and weak-label NER sets.

Pinned semantics (ASCII-only, oracle-reproducible — Unicode
title-casing diverges between engines):

- TOKENS: ASCII-whitespace split of ``text``, empties removed (the
  ops/postings.py rule);
- a CAP token matches ``^[A-Z][a-z]+$`` exactly (no digits, no
  punctuation, no ALL-CAPS — acronyms are a different signal);
- a CANDIDATE is a maximal run of >= 2 CONSECUTIVE cap tokens
  (consecutive in the filtered token sequence); single cap tokens
  are noise (sentence starts) and emit nothing;
- ``name`` joins the run's tokens with one space; ``n_tokens`` its
  length; ``span_pos`` the 0-based index among the doc's candidates
  in token order.

Spark shape: posexplode → cap filter → the gaps-and-islands
(pos - row_number) grouping — both windows partition by doc (bounded
by the doc's own token count, never corpus-keyed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["name_candidates", "duckdb_names_sql"]

_CAP_RE = "^[A-Z][a-z]+$"


def name_candidates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, span_pos, name, n_tokens)`` — maximal >=2-token
    capitalized runs."""
    from hickoryspark.ops.postings import token_positions

    caps = token_positions(docs, text_col).where(
        F.col("term").rlike(_CAP_RE))
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = caps.withColumn(
        "grp", F.col("pos") - F.row_number().over(w))
    spans = (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("_start"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "term"))),
                    lambda s: s["term"]),
                " ").alias("name"),
        )
        .where(F.col("n_tokens") >= 2)
    )
    w2 = Window.partitionBy("doc_id").orderBy("_start")
    return spans.select(
        "doc_id",
        (F.row_number().over(w2) - 1).cast("long").alias("span_pos"),
        "name", "n_tokens",
    )


def duckdb_names_sql(docs_rel: str) -> str:
    """Full DuckDB mirror — same tokenization, cap rule, islands."""
    return f"""
        WITH occ AS (
          SELECT doc_id, u.i - 1 AS pos, lst[u.i] AS term
          FROM (SELECT doc_id,
                       list_filter(regexp_split_to_array(
                         text, '{ASCII_WS_SPLIT_RE}'),
                         s -> s != '') AS lst
                FROM {docs_rel}) t,
               unnest(range(1, len(lst) + 1)) AS u(i)),
        caps AS (
          SELECT doc_id, pos, term,
                 pos - ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY pos) AS grp
          FROM occ WHERE regexp_matches(term, '{_CAP_RE}')),
        spans AS (
          SELECT doc_id, grp, MIN(pos) AS _start,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 string_agg(term, ' ' ORDER BY pos) AS name
          FROM caps GROUP BY doc_id, grp
          HAVING COUNT(*) >= 2)
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY _start) - 1 AS BIGINT)
                   AS span_pos,
               name, n_tokens
        FROM spans"""
