"""Stylometric signals — the two classic corpus-linguistics profiles
used for authorship attribution and vocabulary characterization:

- ``function_word_profile``: Burrows-style function-word rates. The
  attribution literature (Burrows 2002 "Delta") works over rates of
  closed-class words because they are topic-independent; the profile
  here is the DENSE (doc x word) rate matrix in exact integer
  per-10k-token units — zeros included, because "never uses 'of'" is
  itself a stylometric signal.
- ``term_burstiness``: Church & Gale burstiness — collection
  frequency over document frequency. Content words clump (high
  cf/df); function words spread evenly (cf/df near their rate). In
  pipeline terms this separates topical keywords from glue without
  any stopword list.

Pinned semantics (oracle-reproducible): tokens are
``split(text, ' ')`` verbatim (single-space corpus contract, no case
folding); ``rate_e4 = (10000 * n) div greatest(n_tokens, 1)``;
``burst_milli = (1000 * cf) div df`` — all non-negative BIGINT.

Scale shape: one token explode + aggregation each; the function-word
frame densifies via a crossJoin with the TINY broadcast word list
(|words| rows) and a null-safe left join of the counts — never a
per-doc pivot. Burstiness is a single groupBy(term) with both
aggregates in one pass, top-k bounded sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["FUNCTION_WORDS", "function_word_profile", "term_burstiness"]

#: pinned Burrows-style closed-class list (order = output grading
#: order; changing it changes every profile row)
FUNCTION_WORDS = (
    "the", "of", "and", "to", "a", "in", "that", "is", "for", "it",
)


def function_word_profile(
    docs: DataFrame,
    words: tuple[str, ...] = FUNCTION_WORDS,
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, word, n, rate_e4), dense over doc x words."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        "doc_id", F.size(toks).cast("long").alias("_n_tokens"), toks.alias("_t")
    )
    word_rows = base.sparkSession.createDataFrame(
        [(w,) for w in words], "word string"
    )
    counts = (
        base.select("doc_id", F.explode("_t").alias("word"))
        .where(F.col("word").isin(*words))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    dense = (
        base.select("doc_id", "_n_tokens")
        .crossJoin(F.broadcast(word_rows))
        .join(counts, ["doc_id", "word"], "left")
    )
    n = F.coalesce(F.col("_c"), F.lit(0)).cast("long")
    return dense.select(
        "doc_id",
        "word",
        n.alias("n"),
        F.expr(
            "(10000 * coalesce(_c, 0)) div greatest(_n_tokens, 1)"
        ).cast("long").alias("rate_e4"),
    )


def term_burstiness(
    docs: DataFrame,
    min_cf: int = 5,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """-> (term, cf, df, burst_milli), top-k by
    (burst_milli DESC, cf DESC, term) — a deterministic total order."""
    toks = F.split(F.col(text_col), " ")
    per_doc = docs.select("doc_id", F.explode(toks).alias("term"))
    stats = (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cf"),
            F.count_distinct("doc_id").cast("long").alias("df"),
        )
        .where(F.col("cf") >= min_cf)
    )
    return (
        stats.select(
            "term", "cf", "df",
            F.expr("(1000 * cf) div df").cast("long").alias("burst_milli"),
        )
        .orderBy(F.col("burst_milli").desc(), F.col("cf").desc(), "term")
        .limit(top_k)
    )
