"""Corpus term statistics — TF-IDF keyword extraction and unigram
language-model surprisal scoring.

Two classic corpus-level signals over the same token relation:

- ``tfidf_top_terms``: the k most TF-IDF-salient terms per document
  (search indexing, weak labeling, topic sampling);
- ``unigram_surprisal``: per-document mean negative log-probability
  under the corpus's own unigram distribution — the cheap stand-in for
  the KenLM perplexity filter CCNet-style pipelines use to rank
  fluency (high surprisal = rare-token soup; low = repetitive).

Pinned semantics (oracle-reproducible):

- TOKENS: ASCII-whitespace split, empties removed, NO case folding
  (JVM vs DuckDB Unicode lowercasing disagree on edge casings — and
  the key rule here must be byte-exact across engines);
- idf = ln((N + 1) / (df + 1)) + 1 (smoothed, sklearn-style), where N
  is the corpus document count and df the number of DISTINCT documents
  containing the term;
- score = tf * idf, ROUNDED to 6 decimals BEFORE ranking so the
  engines rank identical values; rank orders by (score DESC, term ASC)
  — the term tiebreak makes top-k deterministic;
- surprisal(term) = ln(total_tokens / corpus_count(term));
  ``avg_surprisal`` is the token-weighted mean, rounded to 6.

Scale shape: all JVM-side. The term-frequency base is one
(doc_id, term) aggregation; document frequency and corpus term totals
are groupBy-by-term aggregates equi-joined back (map-side partial
combine + AQE-skew-splittable join — a window over partitionBy(term)
would funnel a stopword's every row through one unsplittable
WindowExec task). The shared tf child is written so both consumers
prune identical columns and ReuseExchange fires (verified by the plan
test). Corpus document/token totals ride broadcast one-row aggregates
off cheap second scans. Top-k is a per-doc window with the rank filter
pushed as WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["term_frequencies", "tfidf_top_terms", "unigram_surprisal",
           "bigram_dice", "duckdb_bigram_dice_sql"]


def term_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, term, tf)`` — one row per distinct term per doc."""
    toks = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE), lambda t: t != ""
    )
    return (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5,
                    text_col: str = "text") -> DataFrame:
    """Top-k TF-IDF terms per document:
    ``(doc_id, term, tf, score, rank)``."""
    tf = term_frequencies(docs, text_col)
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    # document frequency via groupBy + equi-join, NOT a window over
    # partitionBy(term): a stopword's rows all land in ONE WindowExec
    # task (AQE can split skewed join partitions but never window
    # partitions), while the aggregate partial-combines map-side and
    # the join stays AQE-skew-splittable. df must CONSUME the tf column
    # (sum of tf>0, which equals the row count since tf >= 1): a plain
    # count(*) — or count("tf"), which the optimizer rewrites to
    # count(1) — would prune tf out of this branch's child aggregate,
    # making the two tf subtrees differ and killing the ReusedExchange
    # that keeps the token explode single-pass (plan-guarded).
    df_rel = tf.groupBy("term").agg(
        F.sum((F.col("tf") > 0).cast("long")).alias("df")
    )
    scored = (
        tf.join(df_rel, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                6,
            ),
        )
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_doc))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score",
                F.col("rank").cast("int").alias("rank"))
    )


def unigram_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document unigram-LM fluency score:
    ``(doc_id, n_tokens, avg_surprisal)``; zero-token docs are absent
    (no distribution to score under)."""
    tf = term_frequencies(docs, text_col)
    # corpus term totals via groupBy + join (same skew rationale as
    # tfidf_top_terms: a mega-term must stay out of a single
    # WindowExec task)
    term_totals = tf.groupBy("term").agg(
        F.sum("tf").alias("term_total")
    )
    with_counts = tf.join(term_totals, "term")
    # the corpus-total scalar comes from a SECOND, cheap scan of the
    # raw docs (size of the token array — text column only, no explode
    # shuffle) rather than re-aggregating the tf lineage: a diamond
    # over tf would re-execute the whole token groupBy per branch
    toks = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE), lambda t: t != ""
    )
    totals = docs.agg(
        F.sum(F.size(toks)).cast("long").alias("corpus_total")
    )
    return (
        with_counts.join(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("corpus_total") / F.col("term_total"))
                )
                / F.sum("tf"),
                6,
            ).alias("avg_surprisal"),
        )
    )


def bigram_dice(docs: DataFrame, min_count: int = 2,
                text_col: str = "text") -> DataFrame:
    """Collocation mining — corpus-wide adjacent-bigram affinity by
    the Dice coefficient: ``dice_milli = (1000 * 2 * n_pair) div
    (c_w1 + c_w2)`` over the shared ASCII-whitespace tokens.  The
    standard phrase-vocabulary step (tokenizer merges, query
    suggestion, stopword-phrase audits).

    Dice, not PMI, by design: PMI's ``c_xy * N² / (N_bi * c_x *
    c_y)`` ratio overflows BIGINT at web scale (N² alone passes 1e18
    near 1e9 tokens) and needs a log for readability; Dice is bounded
    in [0, 1000] milli-units, exact in 64-bit at ANY corpus size, and
    ranks collocations the same way for the common screening use.

    Scale shape: bigrams build row-locally (ops/dedup.join_ngrams —
    the LINEAR zip_with chain, never the O(n²) transform/slice form),
    count map-side, threshold AT the aggregation; the two unigram
    attachments are plain term equi-joins (AQE handles the skew of
    stopword terms). No windows, no Python."""
    from hickoryspark.ops.dedup import join_ngrams

    toks = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE), lambda t: t != "")
    uni = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pairs = (
        docs.select(F.explode(join_ngrams(toks, 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
        .select(
            F.substring_index("gram", " ", 1).alias("w1"),
            F.substring_index("gram", " ", -1).alias("w2"),
            "n_pair",
        )
    )
    out = (
        pairs.join(uni.withColumnsRenamed({"term": "w1", "c": "_c1"}),
                   "w1")
        .join(uni.withColumnsRenamed({"term": "w2", "c": "_c2"}), "w2")
    )
    return out.select(
        "w1", "w2", "n_pair",
        F.expr("(1000 * 2 * n_pair) div (_c1 + _c2)")
        .cast("long").alias("dice_milli"),
    )


def duckdb_bigram_dice_sql(docs_rel: str, min_count: int = 2) -> str:
    """Full DuckDB mirror of :func:`bigram_dice` (same tokenization,
    same integer arithmetic)."""
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(
                   text, '{ASCII_WS_SPLIT_RE}'), s -> s != '') AS lst
          FROM {docs_rel}),
        occ AS (
          SELECT lst[i] AS term
          FROM tok, unnest(range(1, len(lst) + 1)) AS u(i)),
        uni AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS c
          FROM occ GROUP BY term),
        big AS (
          SELECT lst[i] AS w1, lst[i + 1] AS w2
          FROM tok, unnest(range(1, len(lst))) AS u(i)),
        pairs AS (
          SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
          FROM big GROUP BY w1, w2
          HAVING COUNT(*) >= {min_count})
        SELECT p.w1, p.w2, p.n_pair,
               CAST((1000 * 2 * p.n_pair) // (u1.c + u2.c) AS BIGINT)
                   AS dice_milli
        FROM pairs p
        JOIN uni u1 ON u1.term = p.w1
        JOIN uni u2 ON u2.term = p.w2"""
