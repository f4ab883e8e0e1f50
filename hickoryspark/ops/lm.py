"""N-gram language-model count relations — the KenLM/CCNet
preprocessing half: raw n-gram counts and Kneser-Ney continuation
counts over the corpus token stream.

CCNet-style pipelines rank documents by perplexity under an n-gram LM;
training that LM starts from exactly these two relations: ``count(w_1
.. w_n)`` and, for KN smoothing, the CONTINUATION count of each
(n-1)-gram suffix — how many distinct left contexts it appears after
(types, not tokens). The reference engine has no equivalent; this
extends the §2 surface the same way ops/terms.py does.

Pinned semantics (oracle-reproducible):

- TOKENS: ASCII-whitespace split, empties removed, no case folding
  (the ops/terms.py rule);
- an n-gram is n CONSECUTIVE tokens space-joined (dedup.join_ngrams —
  the LINEAR builder, never the quadratic transform/slice form); docs
  shorter than n contribute nothing; no sentence padding / BOS-EOS
  markers (documented — callers add markers upstream if their LM
  wants them);
- continuation rows: for each n-gram ``w_1 .. w_n``, the pair
  ``(first=w_1, suffix=w_2 .. w_n)``; ``n_contexts(suffix)`` = COUNT
  DISTINCT first — the KN N1+(• suffix) statistic.

Scale shape: one explode per relation into a map-side-combinable
aggregation keyed on the gram — stopword-ish grams partial-aggregate
inside each task, and the suffix relation is built by ALIGNED SLICES
of the once-evaluated token array (first_i = toks[i], suffix_i =
(n-1)-gram_{i+1}) — never by re-splitting gram strings. No windows,
no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE
from hickoryspark.ops.dedup import join_ngrams

__all__ = ["ngram_counts", "continuation_counts"]


def _toks(text_col: str) -> Column:
    return F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE), lambda t: t != ""
    )


def ngram_counts(docs: DataFrame, n: int = 3,
                 text_col: str = "text") -> DataFrame:
    """``(ngram, cnt)`` — corpus occurrence counts of space-joined
    token n-grams."""
    if n < 1:
        raise ValueError("n must be >= 1")
    return (
        docs.select(F.explode(join_ngrams(_toks(text_col), n))
                    .alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def continuation_counts(docs: DataFrame, n: int = 3,
                        text_col: str = "text") -> DataFrame:
    """``(suffix, n_contexts)`` — for each (n-1)-gram suffix, the
    number of DISTINCT first tokens preceding it anywhere in the
    corpus (Kneser-Ney N1+(• suffix))."""
    if n < 2:
        raise ValueError("n must be >= 2 (a suffix needs n-1 tokens)")
    toks = _toks(text_col)
    cnt = F.size(toks) - (n - 1)
    # aligned slices over the ONE token array: first_i pairs with the
    # (n-1)-gram starting at i+1
    firsts = F.slice(toks, 1, cnt)
    suffixes = F.slice(join_ngrams(toks, n - 1), 2, cnt)
    pairs = F.when(cnt >= 1, F.arrays_zip(
        firsts.alias("first"), suffixes.alias("suffix"))).otherwise(
        F.array().cast("array<struct<first:string,suffix:string>>"))
    return (
        docs.select(F.explode(pairs).alias("p"))
        .select(F.col("p.first").alias("first"),
                F.col("p.suffix").alias("suffix"))
        .groupBy("suffix")
        .agg(F.count_distinct("first").cast("long").alias("n_contexts"))
    )
