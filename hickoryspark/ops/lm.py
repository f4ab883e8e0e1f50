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


def jm_bigram_scores(
    train: DataFrame,
    score: DataFrame,
    lam_milli: int = 700,
    text_col: str = "text",
) -> DataFrame:
    """Jelinek-Mercer interpolated bigram LM scoring (Jelinek &
    Mercer 1980; the fixed-weight member of the smoothing family
    next to Stupid Backoff and KN continuation in this module):
    per-document mean cost under

        p(w|h) = lam * c(h,w)/c(h) + (1 - lam) * (c(w)+1)/(N+V+1)

    with ``lam = lam_milli/1000``, the unigram leg add-one-smoothed
    (so p > 0 always — the interpolation never needs its own OOV
    case). Output ``(doc_id, n_bigrams, micronats_per_bigram)``;
    docs with < 2 tokens keep their row with NULL score.

    Cross-engine exactness: the per-BIGRAM cost is quantized first —
    ``ROUND(-1e6 * ln(term1 + term2))`` where each term is the
    literal fraction above composed of correctly-rounded IEEE
    div/mul/add in the SAME written order as the mirror; the doc fold
    is then BIGINT sum + one integer division (order-independent).
    An unseen history contributes term1 = 0 (CASE-guarded — never a
    0/0), matching pure unigram fallback.

    Scale shape: bigram/history/unigram counts are three token-grain
    aggregations off the train half (vocabulary-sized — joined, not
    broadcast); scoring is a (doc, gram) tf rollup + three equi-joins
    + one BIGINT per-doc fold. Corpus scalars cross in broadcast.
    """
    from hickoryspark.ops.dedup import join_ngrams

    toks = _toks(text_col)
    # three consumers (scalars, the unigram join, the history counts)
    # would each re-run the token explode+aggregation — checkpoint
    # once (the cooccurrence_pmi rule); hist IS uni renamed, exactly
    # as the mirror writes it
    uni = (
        train.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c_w"))
        .localCheckpoint(eager=True)
    )
    scalars = uni.agg(F.sum("c_w").cast("long").alias("n_train"),
                      F.count("*").cast("long").alias("v_train"))
    t_bi = train.select(
        F.explode(join_ngrams(toks, 2)).alias("gram"))
    bi = t_bi.groupBy("gram").agg(
        F.count("*").cast("long").alias("c_hw"))
    # NOTE: c(h) counts every occurrence of h, including a final
    # token that starts no bigram — the standard ML denominator
    # approximation; pinned (the mirror uses the same).
    hist = uni.select(F.col("w").alias("h"),
                      F.col("c_w").alias("c_h"))

    sb = score.select(
        "doc_id", F.explode_outer(join_ngrams(toks, 2)).alias("gram"))
    tf = sb.groupBy("doc_id", "gram").agg(
        F.count(F.when(F.col("gram").isNotNull(), 1))
        .cast("long").alias("tf"))
    split = F.split(F.col("gram"), " ")
    joined = (
        tf.withColumn("_h", split[0])
        .withColumn("_w", split[1])
        .join(bi, "gram", "left")
        .join(hist, F.col("_h") == F.col("h"), "left")
        .join(uni.withColumnRenamed("w", "_uw"),
              F.col("_w") == F.col("_uw"), "left")
        .crossJoin(F.broadcast(scalars))
    )
    lam = float(lam_milli)
    term1 = F.when(
        F.coalesce(F.col("c_h"), F.lit(0)) > 0,
        (F.lit(lam) * F.coalesce(F.col("c_hw"), F.lit(0))
         .cast("double"))
        / (F.lit(1000.0) * F.col("c_h").cast("double")),
    ).otherwise(F.lit(0.0))
    term2 = (
        F.lit(1000.0 - lam)
        * (F.coalesce(F.col("c_w"), F.lit(0)) + 1).cast("double")
    ) / (
        F.lit(1000.0)
        * (F.col("n_train") + F.col("v_train") + 1).cast("double")
    )
    cost = F.round(F.lit(-1000000.0) * F.log(term1 + term2)).cast("long")
    per_doc = joined.groupBy("doc_id").agg(
        F.sum(F.col("tf") * cost).cast("long").alias("_total"),
        F.sum("tf").cast("long").alias("n_bigrams"),
    )
    return per_doc.select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.when(F.col("n_bigrams") > 0, F.expr("_total div n_bigrams"))
        .cast("long").alias("micronats_per_bigram"),
    )


def duckdb_jm_bigram_sql(
    train_rel: str, score_rel: str, lam_milli: int = 700
) -> str:
    """Full mirror of :func:`jm_bigram_scores` — same tokenization,
    bigram build, cost expression shape, and integer fold."""
    ws = f"'{ASCII_WS_SPLIT_RE}'"
    toks = (f"list_filter(regexp_split_to_array(text, {ws}), "
            "x -> x <> '')")
    grams = (
        f"list_transform(range(1, greatest(len({toks}) - 1, 0) + 1), "
        f"i -> {toks}[i] || ' ' || {toks}[i + 1])"
    )
    lam = float(lam_milli)
    return f"""
        WITH t_uni AS (
          SELECT u.w FROM {train_rel},
               unnest({toks}) AS u(w)
        ), uni AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w
          FROM t_uni GROUP BY w
        ), scalars AS (
          SELECT CAST(SUM(c_w) AS BIGINT) AS n_train,
                 CAST(COUNT(*) AS BIGINT) AS v_train FROM uni
        ), bi AS (
          SELECT g.gram, CAST(COUNT(*) AS BIGINT) AS c_hw
          FROM {train_rel}, unnest({grams}) AS g(gram)
          GROUP BY g.gram
        ), hist AS (
          SELECT w AS h, c_w AS c_h FROM uni
        ), sb AS (
          SELECT doc_id, g.gram
          FROM {score_rel}, unnest({grams}) AS g(gram)
        ), tf AS (
          SELECT doc_id, gram,
                 CAST(COUNT(*) AS BIGINT) AS tf
          FROM sb GROUP BY doc_id, gram
        ), j AS (
          SELECT tf.doc_id, tf.gram, tf.tf,
                 string_split(tf.gram, ' ')[1] AS _h,
                 string_split(tf.gram, ' ')[2] AS _w,
                 bi.c_hw, hist.c_h, uni.c_w,
                 scalars.n_train, scalars.v_train
          FROM tf
          LEFT JOIN bi ON tf.gram = bi.gram
          LEFT JOIN hist ON string_split(tf.gram, ' ')[1] = hist.h
          LEFT JOIN uni ON string_split(tf.gram, ' ')[2] = uni.w
          CROSS JOIN scalars
        ), costed AS (
          SELECT doc_id, tf,
                 CAST(ROUND(-1000000.0 * LN(
                   CASE WHEN COALESCE(c_h, 0) > 0
                        THEN ({lam} * CAST(COALESCE(c_hw, 0) AS DOUBLE))
                             / (1000.0 * CAST(c_h AS DOUBLE))
                        ELSE 0.0 END
                   + ({1000.0 - lam}
                      * CAST(COALESCE(c_w, 0) + 1 AS DOUBLE))
                     / (1000.0 * CAST(n_train + v_train + 1 AS DOUBLE))
                 )) AS BIGINT) AS cost
          FROM j
        ), scored AS (
          SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
                 CAST(SUM(tf * cost) AS BIGINT) AS total
          FROM costed GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CASE WHEN sc.n_bigrams > 0
                    THEN CAST(sc.total // sc.n_bigrams AS BIGINT)
               END AS micronats_per_bigram
        FROM {score_rel} d LEFT JOIN scored sc USING (doc_id)"""
