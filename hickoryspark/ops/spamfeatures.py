"""Content-spam features — Ntoulas, Najork, Manasse & Fetterly (WWW
2006), "Detecting Spam Web Pages through Content Analysis". The
classic per-page feature vector their classifier consumes; spam-farm
pages score anomalously on word-length, title stuffing, and
popular-word fractions. (The paper's compression-ratio feature lives
separately in ops/compressratio.py.)

Pinned exact-integer dialect, all milli fractions:

- tokens = the shared ASCII-ws split, no case folding;
- ``n_words``, ``avg_word_len_milli = (1000 * sum_chars) div
  n_words`` (0 for empty docs), ``title_words``;
- ``frac_top_milli``: fraction of the doc's word OCCURRENCES that are
  corpus top-``k`` words (the paper's "fraction of page drawn from
  globally popular words");
- ``top_coverage_milli``: fraction of the top-``k`` vocabulary
  present in the doc (the paper's "fraction of globally popular
  words used");
- the top-``k`` set is the ``k`` highest-count corpus terms with the
  DETERMINISTIC tie rule (count DESC, term ASC) — both engines rank
  identically.

Scale shape: the corpus term-count rollup is map-side combinable on
the (term) grain; the top-``k`` pick is a window over that tiny
distinct-term relation; the ``k``-row set broadcasts back into the
per-doc occurrence join (AQE). One exchange per rollup, nothing
shuffles page bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["spam_features", "duckdb_spam_features_sql",
           "DEFAULT_TOP_K"]

DEFAULT_TOP_K = 200


def _toks(col):
    return F.filter(F.split(F.coalesce(col, F.lit("")),
                            ASCII_WS_SPLIT_RE),
                    lambda t: t != "")


def spam_features(docs: DataFrame, text_col: str = "text",
                  title_col: str = "title",
                  top_k: int = DEFAULT_TOP_K) -> DataFrame:
    """(doc_id, n_words, avg_word_len_milli, title_words,
    frac_top_milli, top_coverage_milli) per doc."""
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _toks(F.col(text_col)).alias("_tt"),
        F.size(_toks(F.col(title_col))).cast("long")
        .alias("title_words"))
    occ = base.select("doc_id", F.explode("_tt").alias("term"))
    counts = occ.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    top = (counts.withColumn("_r", F.row_number().over(w))
           .where(F.col("_r") <= top_k)
           .select("term"))
    per = base.select(
        "doc_id", "title_words",
        F.size("_tt").cast("long").alias("n_words"),
        F.aggregate("_tt", F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t))
        .alias("sum_chars"))
    hits = (occ.join(F.broadcast(top), "term")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("top_occ"),
                 F.count_distinct("term").cast("long")
                 .alias("top_vocab")))
    return (per.join(hits, "doc_id", "left")
            .select(
                "doc_id", "n_words",
                F.when(F.col("n_words") > 0,
                       F.expr("(1000 * sum_chars) div n_words"))
                .otherwise(F.lit(0)).cast("long")
                .alias("avg_word_len_milli"),
                "title_words",
                F.when(F.col("n_words") > 0, F.expr(
                    "(1000 * coalesce(top_occ, 0)) div n_words"))
                .otherwise(F.lit(0)).cast("long")
                .alias("frac_top_milli"),
                F.expr(f"(1000 * coalesce(top_vocab, 0))"
                       f" div {int(top_k)}")
                .cast("long").alias("top_coverage_milli")))


def duckdb_spam_features_sql(docs_rel: str,
                             top_k: int = DEFAULT_TOP_K) -> str:
    """Full DuckDB mirror over a relation exposing (doc_id, title,
    text)."""
    return f"""
        WITH spf_base AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(
                   COALESCE(text, ''), '{ASCII_WS_SPLIT_RE}'),
                   s -> s != '') AS tt,
                 CAST(len(list_filter(regexp_split_to_array(
                   COALESCE(title, ''), '{ASCII_WS_SPLIT_RE}'),
                   s -> s != '')) AS BIGINT) AS title_words
          FROM {docs_rel}),
        spf_occ AS (
          SELECT doc_id, t.term
          FROM spf_base, unnest(tt) AS t(term)),
        spf_counts AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM spf_occ GROUP BY term),
        spf_top AS (
          SELECT term FROM spf_counts
          QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC)
                  <= {int(top_k)}),
        spf_per AS (
          SELECT doc_id, title_words,
                 CAST(len(tt) AS BIGINT) AS n_words,
                 CAST(COALESCE(list_sum(list_transform(
                   tt, s -> len(s))), 0) AS BIGINT) AS sum_chars
          FROM spf_base),
        spf_hits AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS top_occ,
                 CAST(COUNT(DISTINCT term) AS BIGINT) AS top_vocab
          FROM spf_occ WHERE term IN (SELECT term FROM spf_top)
          GROUP BY doc_id)
        SELECT p.doc_id, p.n_words,
               CAST(CASE WHEN p.n_words > 0
                    THEN (1000 * p.sum_chars) // p.n_words
                    ELSE 0 END AS BIGINT) AS avg_word_len_milli,
               p.title_words,
               CAST(CASE WHEN p.n_words > 0
                    THEN (1000 * COALESCE(h.top_occ, 0)) // p.n_words
                    ELSE 0 END AS BIGINT) AS frac_top_milli,
               CAST((1000 * COALESCE(h.top_vocab, 0))
                    // {int(top_k)} AS BIGINT) AS top_coverage_milli
        FROM spf_per p LEFT JOIN spf_hits h USING (doc_id)"""
