"""Stupid Backoff n-gram scoring — web-scale LM relevance scores.

Brants et al. (EMNLP 2007, "Large Language Models in Machine
Translation"): at web scale, unsmoothed count ratios with a constant
back-off multiplier (α = 0.4) match Kneser-Ney quality at a fraction
of the cost, because no normalization pass over the full n-gram
table is needed. The corpus-pipeline use: score candidate
continuations / rank extraction candidates against corpus statistics
without training anything.

Pinned EXACT-INTEGER dialect (micro units, α = 0.4 and α² = 0.16
folded into the numerator constants so each level is ONE integer
division):

- trigram level:  ``score = (1000000 * c(w1 w2 w3)) div c(w1 w2)``
  when the trigram occurs (its prefix bigram then necessarily
  occurs too — substring property);
- bigram backoff: ``score = (400000 * c(w2 w3)) div c(w2)``;
- unigram backoff: ``score = (160000 * c(w3)) div N`` with N = total
  corpus tokens;
- unseen ``w3`` → level ``'oov'``, score 0.

Counts come from :func:`hickoryspark.ops.lm.ngram_counts` (same
tokenization as every LM op). Scale shape: three count aggregations
over the corpus (map-side combinable), then the query table —
typically tiny — left-joins each count relation on its ngram key
(AQE broadcasts the query side or the count side as sizes dictate);
the total-token count rides along as a broadcast 1-row cross join.
No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.lm import ngram_counts

__all__ = ["stupid_backoff_scores", "duckdb_backoff_sql"]


def stupid_backoff_scores(docs: DataFrame, queries: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """``queries`` (qid, w1, w2, w3) → ``(qid, w1, w2, w3, level,
    score_micro)`` with level ∈ {'trigram','bigram','unigram','oov'}."""
    tri = ngram_counts(docs, 3, text_col).withColumnRenamed(
        "cnt", "c3")
    bi = ngram_counts(docs, 2, text_col).withColumnRenamed("cnt", "c2")
    uni = ngram_counts(docs, 1, text_col).withColumnRenamed(
        "cnt", "c1")
    total = uni.agg(F.sum("c1").cast("long").alias("n_total"))

    q = queries.select("qid", "w1", "w2", "w3")
    key3 = F.concat_ws(" ", "w1", "w2", "w3")
    key2_ctx = F.concat_ws(" ", "w1", "w2")
    key2 = F.concat_ws(" ", "w2", "w3")
    j = (
        q.join(tri, key3 == tri["ngram"], "left").drop("ngram")
        .join(bi.select(F.col("ngram").alias("_n2c"),
                        F.col("c2").alias("c_ctx")),
              key2_ctx == F.col("_n2c"), "left").drop("_n2c")
        .join(bi.select(F.col("ngram").alias("_n2"),
                        F.col("c2").alias("c_bg")),
              key2 == F.col("_n2"), "left").drop("_n2")
        .join(uni.select(F.col("ngram").alias("_u2"),
                         F.col("c1").alias("c_w2")),
              F.col("w2") == F.col("_u2"), "left").drop("_u2")
        .join(uni.select(F.col("ngram").alias("_u3"),
                         F.col("c1").alias("c_w3")),
              F.col("w3") == F.col("_u3"), "left").drop("_u3")
        .crossJoin(F.broadcast(total))
    )
    level = (
        F.when(F.col("c3").isNotNull(), F.lit("trigram"))
        .when(F.col("c_bg").isNotNull(), F.lit("bigram"))
        .when(F.col("c_w3").isNotNull(), F.lit("unigram"))
        .otherwise(F.lit("oov"))
    )
    score = (
        F.when(F.col("c3").isNotNull(),
               F.expr("(1000000 * c3) div c_ctx"))
        .when(F.col("c_bg").isNotNull(),
              F.expr("(400000 * c_bg) div c_w2"))
        .when(F.col("c_w3").isNotNull(),
              F.expr("(160000 * c_w3) div n_total"))
        .otherwise(F.lit(0))
    )
    return j.select("qid", "w1", "w2", "w3", level.alias("level"),
                    score.cast("long").alias("score_micro"))


def duckdb_backoff_sql(docs_rel: str, queries_rel: str,
                       text_col: str = "text") -> str:
    """DuckDB mirror over ``docs_rel`` (doc_id, text) and
    ``queries_rel`` (qid, w1, w2, w3)."""
    ws = ("'[ ' || chr(9) || chr(10) || chr(11) || chr(12) || "
          "chr(13) || ']+'")
    return f"""
        WITH bo_toks AS (
          SELECT list_filter(regexp_split_to_array({text_col}, {ws}),
                             x -> x <> '') AS t
          FROM {docs_rel}
        ), bo_tri AS (
          SELECT g AS ngram, CAST(COUNT(*) AS BIGINT) AS c3 FROM (
            SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
            FROM bo_toks, unnest(range(1, len(t) - 1)) AS u(i))
          GROUP BY g
        ), bo_bi AS (
          SELECT g AS ngram, CAST(COUNT(*) AS BIGINT) AS c2 FROM (
            SELECT t[i] || ' ' || t[i+1] AS g
            FROM bo_toks, unnest(range(1, len(t))) AS u(i))
          GROUP BY g
        ), bo_uni AS (
          SELECT g AS ngram, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
            SELECT unnest(t) AS g FROM bo_toks)
          GROUP BY g
        ), bo_tot AS (
          SELECT CAST(SUM(c1) AS BIGINT) AS n_total FROM bo_uni
        ), bo_j AS (
          SELECT q.qid, q.w1, q.w2, q.w3,
                 t3.c3, bc.c2 AS c_ctx, bg.c2 AS c_bg,
                 u2.c1 AS c_w2, u3.c1 AS c_w3, bo_tot.n_total
          FROM {queries_rel} q
          LEFT JOIN bo_tri t3
            ON q.w1 || ' ' || q.w2 || ' ' || q.w3 = t3.ngram
          LEFT JOIN bo_bi bc ON q.w1 || ' ' || q.w2 = bc.ngram
          LEFT JOIN bo_bi bg ON q.w2 || ' ' || q.w3 = bg.ngram
          LEFT JOIN bo_uni u2 ON q.w2 = u2.ngram
          LEFT JOIN bo_uni u3 ON q.w3 = u3.ngram
          CROSS JOIN bo_tot)
        SELECT qid, w1, w2, w3,
               CASE WHEN c3 IS NOT NULL THEN 'trigram'
                    WHEN c_bg IS NOT NULL THEN 'bigram'
                    WHEN c_w3 IS NOT NULL THEN 'unigram'
                    ELSE 'oov' END AS level,
               CAST(CASE WHEN c3 IS NOT NULL
                         THEN (1000000 * c3) // c_ctx
                         WHEN c_bg IS NOT NULL
                         THEN (400000 * c_bg) // c_w2
                         WHEN c_w3 IS NOT NULL
                         THEN (160000 * c_w3) // n_total
                         ELSE 0 END AS BIGINT) AS score_micro
        FROM bo_j"""
