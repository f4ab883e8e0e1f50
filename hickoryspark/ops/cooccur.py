"""Windowed term co-occurrence + PMI — the collocation-mining
primitive behind word-association tables, PPMI count vectors, and
query-expansion dictionaries (Church & Hanks 1990): count unordered
token pairs within a +-``window`` offset, score by pointwise mutual
information against the unigram margins.

Pinned semantics (oracle-reproducible):

- tokens: ``split(text, ' ')`` verbatim (the corpus is single-space
  tokenized; no case folding, no empty-filtering — both engines see
  identical token streams);
- pairs: for each offset 1..window, the pair of tokens that far
  apart, UNORDERED via (least, greatest) — ASCII token contract (the
  editdist rule: Java UTF-16 vs DuckDB UTF-8 byte order diverge
  beyond the BMP, so the mirror is pinned for ASCII corpora);
- pmi = ROUND(LN((c_xy * N * N) / (T * c_x * c_y)), 6) computed in
  IEEE doubles with EXACTLY this operation shape on both engines
  (single LN over a product/quotient chain, then round-6 BEFORE
  ranking — the tfidf rule), where N = total tokens, T = total pairs;
- output: pairs with ``c_xy >= min_count``, top-k by
  (pmi DESC, w1, w2) — a deterministic total order.

Scale shape: pair generation is LINEAR and row-local — a zip_with
over once-evaluated shifted slices per offset (the join_ngrams
lesson: transform+slice higher-order forms are O(tokens^2)); then one
groupBy(pair) with map-side partial aggregation, two vocab-sized
equi-joins for the margins (joins, never a partitionBy(token) window
— stopword margins would funnel one task), and one-row total
aggregates broadcast by AQE. Top-k is a bounded global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cooccurrence_pmi", "duckdb_cooccur_sql"]


def _offset_pairs(toks: Column, offset: int) -> Column:
    cnt = F.size(toks) - offset
    return F.when(
        cnt >= 1,
        F.zip_with(
            F.slice(toks, 1, cnt),
            F.slice(toks, offset + 1, cnt),
            lambda a, b: F.concat(
                F.least(a, b), F.lit(" "), F.greatest(a, b)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def cooccurrence_pmi(
    docs: DataFrame,
    window: int = 3,
    min_count: int = 5,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """-> (w1, w2, n_pairs, pmi): the top-k PMI collocations."""
    toks = F.split(F.col(text_col), " ")
    pair_arrays = F.concat(
        *[_offset_pairs(toks, o) for o in range(1, window + 1)]
    )
    pairs = (
        docs.select(F.explode(pair_arrays).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .where(F.col("n_pairs") >= min_count)
    )
    # three consumers (corpus total, w1 margin, w2 margin) would each
    # recompute the token explode+aggregation — localCheckpoint
    # (eager) runs it ONCE; the frame is vocab-sized
    tok_counts = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
        .localCheckpoint(eager=True)
    )
    totals = tok_counts.agg(
        F.sum("c_tok").cast("double").alias("_n_toks")
    )
    # total pair count ARITHMETICALLY from doc lengths — a doc of n
    # tokens contributes max(n - o, 0) pairs per offset, so a second
    # end-to-end pair-generation pass just to count rows (which would
    # double the op's dominant stage at scale) is unnecessary
    per_doc = sum(
        (F.greatest(F.size(toks) - o, F.lit(0)) for o in
         range(1, window + 1)),
        F.lit(0),
    )
    pair_total = docs.agg(
        F.sum(per_doc).cast("double").alias("_t_pairs")
    )
    t1 = tok_counts.select(F.col("tok").alias("w1"),
                           F.col("c_tok").alias("_c1"))
    t2 = tok_counts.select(F.col("tok").alias("w2"),
                           F.col("c_tok").alias("_c2"))
    split = F.split(F.col("pair"), " ")
    return (
        pairs.select(
            split[0].alias("w1"), split[1].alias("w2"), "n_pairs"
        )
        .join(t1, "w1")
        .join(t2, "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(pair_total))
        .select(
            "w1",
            "w2",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(
                F.log(
                    (F.col("n_pairs").cast("double")
                     * F.col("_n_toks") * F.col("_n_toks"))
                    / (F.col("_t_pairs")
                       * F.col("_c1").cast("double")
                       * F.col("_c2").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_k)
    )


def duckdb_cooccur_sql(
    docs_rel: str,
    window: int = 3,
    min_count: int = 5,
    top_k: int = 100,
) -> str:
    """Full mirror: per-offset list_zip pair streams UNIONed, then
    the identical margin joins and the identical pmi expression."""
    ptot_terms = " + ".join(
        f"GREATEST(len(toks) - {o}, 0)" for o in range(1, window + 1)
    )
    offs = "\n            UNION ALL\n".join(
        f"""            SELECT doc_id,
                   LEAST(z[1], z[2]) || ' ' || GREATEST(z[1], z[2]) AS pair
            FROM tk, unnest(list_zip(
                   toks[1:len(toks) - {o}],
                   toks[{o + 1}:len(toks)])) AS t(z)
            WHERE len(toks) > {o}"""
        for o in range(1, window + 1)
    )
    return f"""
        WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM {docs_rel}),
        allp AS (
{offs}
        ),
        pairs AS (SELECT pair, COUNT(*) AS n_pairs FROM allp
                  GROUP BY pair HAVING COUNT(*) >= {min_count}),
        tokc AS (SELECT tok, COUNT(*) AS c_tok
                 FROM tk, unnest(toks) AS u(tok) GROUP BY tok),
        tot AS (SELECT CAST(SUM(c_tok) AS DOUBLE) AS n_toks FROM tokc),
        ptot AS (SELECT CAST(SUM({ptot_terms}) AS DOUBLE) AS t_pairs
                 FROM tk)
        SELECT string_split(p.pair, ' ')[1] AS w1,
               string_split(p.pair, ' ')[2] AS w2,
               CAST(p.n_pairs AS BIGINT) AS n_pairs,
               ROUND(LN((CAST(p.n_pairs AS DOUBLE) * tot.n_toks
                         * tot.n_toks)
                        / (ptot.t_pairs * CAST(t1.c_tok AS DOUBLE)
                           * CAST(t2.c_tok AS DOUBLE))), 6) AS pmi
        FROM pairs p
        JOIN tokc t1 ON string_split(p.pair, ' ')[1] = t1.tok
        JOIN tokc t2 ON string_split(p.pair, ' ')[2] = t2.tok
        CROSS JOIN tot CROSS JOIN ptot
        ORDER BY pmi DESC, w1, w2
        LIMIT {top_k}"""
