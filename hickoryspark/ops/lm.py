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

__all__ = ["ngram_counts", "continuation_counts",
           "unigram_logprob_scores", "duckdb_unigram_logprob_sql"]


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


def unigram_logprob_scores(
    train: DataFrame, score: DataFrame, text_col: str = "text"
) -> DataFrame:
    """CCNet-style LM quality scoring — per-document mean negative
    log-probability under an add-one-smoothed UNIGRAM model trained
    on ``train``: ``(doc_id, n_tokens, micronats_per_token)``.

    Pinned exact-integer dialect (the readability/pagerank rule —
    cross-engine hash gates need order-independent arithmetic):

    - model: ``p(t) = (c(t) + 1) / (N + V + 1)`` with ``c`` the
      training occurrence count, ``N`` total training tokens, ``V``
      the training vocabulary size; unseen tokens get the single
      reserved OOV mass ``1 / (N + V + 1)``;
    - per-TERM cost is quantized FIRST:
      ``cost_micro(t) = ROUND(1e6 * ln((N + V + 1) / (c(t) + 1)))``
      as BIGINT — ONE division-then-ln expression shared verbatim
      with the mirror (half-up rounding on both engines; ln > 0
      always since c+1 <= N < N+V+1), so the only float op is a
      single ln on identical inputs;
    - doc score = ``sum(tf * cost_micro) div n_tokens`` — BIGINT
      sums are order-independent, the mean is one integer division
      in micro-nats/token. Zero-token docs keep their row with
      ``n_tokens = 0`` and NULL score (never silently dropped —
      a quality filter must SEE empty docs).

    Scale shape: the model is vocabulary-sized — it does NOT
    broadcast; scoring is (doc, term) tf rollup → equi-join the model
    on term (left join: OOV keeps the row, cost falls back to the
    c=0 branch) → one BIGINT sum per doc. Corpus scalars are one tiny
    crossed-in agg. Perplexity bucketing composes downstream
    (ops/sampling.percentile_buckets)."""
    tt = train.select(F.explode(_toks(text_col)).alias("term"))
    model = tt.groupBy("term").agg(
        F.count("*").cast("long").alias("c"))
    scalars = model.agg(
        F.sum("c").cast("long").alias("n_train"),
        F.count("*").cast("long").alias("v_train"))

    st = score.select(
        "doc_id", F.explode_outer(_toks(text_col)).alias("term"))
    tf = st.groupBy("doc_id", "term").agg(
        F.count(F.when(F.col("term").isNotNull(), 1))
        .cast("long").alias("tf"))
    joined = (tf.join(model, "term", "left")
              .crossJoin(F.broadcast(scalars)))
    denom = F.col("n_train") + F.col("v_train") + 1
    cost = F.round(
        F.lit(1000000.0)
        * F.log(denom.cast("double")
                / (F.coalesce(F.col("c"), F.lit(0)) + 1)
                .cast("double"))
    ).cast("long")
    per_doc = (
        joined.groupBy("doc_id")
        .agg(F.sum(F.col("tf") * cost).cast("long").alias("_total"),
             F.sum("tf").cast("long").alias("n_tokens"))
    )
    return per_doc.select(
        "doc_id", "n_tokens",
        F.when(F.col("n_tokens") > 0,
               F.expr("_total div n_tokens"))
        .cast("long").alias("micronats_per_token"),
    )


def duckdb_unigram_logprob_sql(train_rel: str, score_rel: str) -> str:
    """Full DuckDB mirror of :func:`unigram_logprob_scores` — same
    tokenization, same single division-then-ln-then-round expression,
    same integer fold."""
    ws = f"'{ASCII_WS_SPLIT_RE}'"
    return f"""
        WITH tt AS (
          SELECT t.term
          FROM {train_rel}, unnest(list_filter(
            regexp_split_to_array(text, {ws}), x -> x <> ''))
            AS t(term)
        ), model AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS c
          FROM tt GROUP BY term
        ), scalars AS (
          SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_train,
                 CAST(COUNT(*) AS BIGINT) AS v_train
          FROM model
        ), st AS (
          SELECT doc_id, t.term
          FROM {score_rel}, unnest(list_filter(
            regexp_split_to_array(text, {ws}), x -> x <> ''))
            AS t(term)
        ), tf AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM st GROUP BY doc_id, term
        ), scored AS (
          SELECT tf.doc_id,
                 CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
                 CAST(SUM(tf.tf * CAST(ROUND(
                   1000000.0 * ln(
                     CAST(s.n_train + s.v_train + 1 AS DOUBLE)
                     / CAST(COALESCE(m.c, 0) + 1 AS DOUBLE))
                 ) AS BIGINT)) AS BIGINT) AS total
          FROM tf LEFT JOIN model m USING (term)
          CROSS JOIN scalars s
          GROUP BY tf.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
               CASE WHEN sc.n_tokens > 0
                    THEN CAST(sc.total // sc.n_tokens AS BIGINT)
               END AS micronats_per_token
        FROM {score_rel} d LEFT JOIN scored sc USING (doc_id)"""
