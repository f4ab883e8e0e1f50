"""Per-document keyword extraction — top-k TF-IDF terms per doc.

The corpus-slicing / topic-labeling primitive: every doc gets its k
most distinctive terms, scored against corpus document frequency.
Complements ops/postings.py (the raw index) and ops/retrieval.py
(query-side BM25) with the doc-side ranking.

Pinned exact-integer dialect (oracle-reproducible — float ``log`` idf
would hash-diverge across engines, the ops/terms.py Dice lesson):

- TOKENS: ASCII-whitespace split, empties removed, NO case folding
  (ops/postings.py rule, shared regex);
- ``idf_milli = (1000 * n_docs) div df`` — the raw N/df ratio in
  milli-points (monotone in the classic log idf, so top-k order is a
  valid keyword ranking); ``n_docs`` counts every row of the input
  relation (zero-token docs included);
- ``score_milli = tf * idf_milli``. Overflow bound: needs
  ``tf * 1000 * n_docs <= 2^63``, i.e. fine through billions of docs
  at any sane tf — same bounded-BIGINT stance as ops/terms.py
  (which dropped PMI for exactly this reason);
- optional ``max_df_milli``: drop terms appearing in at least
  ``max_df_milli/1000`` of all docs (``df * 1000 >= max_df_milli *
  n_docs``) — the stopword control, OFF by default;
- rank per doc by ``(score_milli DESC, term ASC)``; keep ``rank <=
  top_k``.

Scale shape: one (doc, term) tf aggregation, df as a map-side-
combinable rollup OF the tf relation, one term-keyed join, one
per-doc window (bounded by the doc's own distinct-term count — never
a term-partitioned window, the stopword-funnel lesson). Corpus
scalars via a 1-row broadcast crossJoin (the ops/retrieval.py
pattern), no driver-side count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["doc_keywords", "duckdb_keywords_sql"]


def doc_keywords(docs: DataFrame, text_col: str = "text",
                 top_k: int = 5,
                 max_df_milli: int | None = None) -> DataFrame:
    """``(doc_id, rank, term, tf, df, score_milli)`` — the pinned
    integer TF-IDF dialect above."""
    from hickoryspark.ops.postings import token_positions

    occ = token_positions(docs, text_col)
    tf = (occ.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    # df rolls up the SAME tf relation. The always-true isNotNull
    # filter on max("tf") keeps the tf column alive through column
    # pruning (a dropped column is dead code and the pruner would
    # rewrite this branch's (doc_id, term) exchange to a narrower
    # shape), so both branches' exchanges canonicalize identically
    # and the corpus is scanned + exploded + shuffled ONCE
    # (ReusedExchange, plan-guarded) instead of twice.
    df = (tf.groupBy("term")
          .agg(F.count(F.lit(1)).cast("long").alias("df"),
               F.max("tf").alias("_keep"))
          .where(F.col("_keep").isNotNull())
          .drop("_keep"))
    scalars = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))

    scored = (tf.join(df, "term")
              .crossJoin(F.broadcast(scalars))
              .withColumn("score_milli",
                          F.expr("tf * ((1000 * n_docs) div df)")
                          .cast("long")))
    if max_df_milli is not None:
        scored = scored.where(
            F.col("df") * 1000 < int(max_df_milli) * F.col("n_docs"))

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_milli").desc(), F.col("term").asc())
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= int(top_k))
            .select("doc_id", "rank", "term", "tf", "df",
                    "score_milli"))


def duckdb_keywords_sql(docs_rel: str, top_k: int = 5,
                        max_df_milli: int | None = None) -> str:
    """Full DuckDB mirror: same tokenization, same integer
    arithmetic, same tie rule. ``docs_rel`` must expose
    (doc_id, text)."""
    df_filter = ""
    if max_df_milli is not None:
        df_filter = (f"WHERE df.df * 1000 < {int(max_df_milli)}"
                     " * s.n_docs")
    return f"""
        WITH occ AS (
          SELECT doc_id, t.term
          FROM {docs_rel}, unnest(list_filter(
            regexp_split_to_array(text, '{ASCII_WS_SPLIT_RE}'),
            s -> s != '')) AS t(term)),
        tf AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM occ GROUP BY doc_id, term),
        df AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS df
          FROM tf GROUP BY term),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM {docs_rel}),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 CAST(tf.tf * ((1000 * s.n_docs) // df.df)
                      AS BIGINT) AS score_milli
          FROM tf JOIN df USING (term) CROSS JOIN s
          {df_filter}),
        ranked AS (
          SELECT doc_id, term, tf, df, score_milli,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY score_milli DESC, term ASC) AS BIGINT)
                     AS rank
          FROM scored)
        SELECT doc_id, rank, term, tf, df, score_milli
        FROM ranked WHERE rank <= {int(top_k)}"""
