"""Benchmark decontamination: flag training documents sharing token
n-grams with an evaluation/benchmark corpus.

The standard pre-training hygiene step (the reference engine has no
equivalent — this extends the §2 surface the same way the dedup/
sampling ops do): an eval suite leaking into the training set inflates
benchmark scores, so documents carrying verbatim benchmark n-grams are
counted and filtered before training. The classic recipe is exact
13-gram overlap; ``n`` is a parameter because this corpus's synthetic
vocabulary makes shorter grams the interesting case.

Scale shape (the part that must survive 100 TB):

- The benchmark side is SMALL (eval suites are MBs) — its distinct
  n-gram set broadcasts, so the training-corpus scan never shuffles
  full text or grams; the only exchange is the per-doc hit-count
  partial aggregation (map-side combined ``(doc_id, count)`` rows).
- Per-doc gram dedup happens BEFORE the explode via ``array_distinct``
  on the row-local shingle array — no distinct-shuffle.
- The broadcast join is a ``left_semi`` (hits only); non-matching
  grams die map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.dedup import shingles

__all__ = ["benchmark_ngrams", "ngram_overlap", "decontaminate"]


def benchmark_ngrams(benchmark: DataFrame, n: int = 13,
                     text_col: str = "text") -> DataFrame:
    """Distinct token n-grams of the benchmark corpus: one column
    ``gram``. Small by construction — meant to be broadcast."""
    return (
        benchmark.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias(
                "gram"
            )
        )
        .distinct()
    )


def ngram_overlap(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                  text_col: str = "text") -> DataFrame:
    """Per-document benchmark contamination counts.

    Returns ``(doc_id, n_hits)`` for EVERY input document (zero-filled
    — the downstream filter wants an explicit per-doc verdict, and the
    full relation is hash-checkable). ``n_hits`` counts the DISTINCT
    n-grams of the doc that appear anywhere in the benchmark corpus.
    """
    bench = benchmark_ngrams(benchmark, n, text_col)
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias(
            "gram"
        ),
    )
    hits = (
        grams.join(F.broadcast(bench), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                  max_hits: int = 0, text_col: str = "text") -> DataFrame:
    """Training docs keeping at most ``max_hits`` benchmark n-grams —
    the actual filter step (default: any overlap removes the doc)."""
    counts = ngram_overlap(docs, benchmark, n, text_col)
    keep = counts.where(F.col("n_hits") <= max_hits).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")
