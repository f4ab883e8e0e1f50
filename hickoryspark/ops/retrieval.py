"""BM25 retrieval scoring over the inverted-index relations — the
sparse-retrieval half of a corpus pipeline (dataset search, dedup
audits, decontamination probes all rank documents against small query
sets; BM25 is the standard sparse scorer).

Pinned EXACT-INTEGER dialect (oracle-reproducible — the readability /
pagerank lesson: cross-engine hash gates need order-independent
arithmetic, and float BM25 sums are neither portable nor
order-independent):

- tokens = the shared ASCII-whitespace tokenization
  (ops/postings.token_positions); no case folding;
- k1 = 6/5, b = 3/4 (the classic defaults as exact rationals);
- ``avgdl`` is pinned to the INTEGER corpus mean ``total_tokens div
  N`` (documented quantization — it keeps every denominator in
  BIGINT range);
- idf is the RATIONAL Robertson-Sparck-Jones core
  ``(N - df + 0.5) / (df + 0.5)`` WITHOUT the logarithm (a monotone
  transform of classic BM25 idf: per-term ranking order is preserved,
  multi-term mixes weight rare terms harder; a pinned dialect, not
  Lucene parity);
- per-(query, doc, term) contribution in MILLI-points, exact integer
  division:
  ``(1000 * 22 * avgdl * tf * (2N - 2df + 1))
  div ((2df + 1) * (10 * avgdl * tf + 3 * avgdl + 9 * dl))``
  — the algebraic fold of ``idf * tf * (k1+1) / (tf + k1 * (1 - b +
  b * dl/avgdl))`` with the rationals cleared;
- query terms are DEDUPLICATED (standard bag-of-words BM25 ignores
  query-side tf); scores sum the per-term integer contributions
  (BIGINT sum — order-independent), ties rank by doc_id ascending.

Scale shape: the query set is tiny — it broadcasts into the postings
join, so only matching (doc, term) rows ever shuffle; df is computed
for QUERY TERMS ONLY (semi-join first, never a full term_stats pass);
corpus scalars (N, total tokens, avgdl) are one tiny agg crossed in.
Top-k is a per-query window over matched docs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["bm25_scores", "duckdb_bm25_sql", "phrase_match",
           "duckdb_phrase_sql",
           "rrf_fuse", "duckdb_rrf_sql",
           "retrieval_metrics", "duckdb_retrieval_metrics_sql",
           "mine_hard_negatives", "duckdb_hard_negatives_sql",
           "mmr_rerank", "duckdb_mmr_sql", "DEFAULT_MMR_LAMBDA_MILLI",
           "bm25f_scores", "duckdb_bm25f_sql", "DEFAULT_BM25F_FIELDS",
           "expand_queries", "duckdb_expand_sql"]


def _query_terms(queries: DataFrame) -> DataFrame:
    """(query_id, term) — deduplicated whitespace tokens."""
    toks = F.filter(
        F.split(F.col("query"), ASCII_WS_SPLIT_RE), lambda t: t != "")
    return (queries
            .select("query_id", F.explode(toks).alias("term"))
            .distinct())


def bm25_scores(docs: DataFrame, queries: DataFrame,
                text_col: str = "text", top_k: int = 10) -> DataFrame:
    """(query_id, doc_id, score_milli, rank) — the top ``top_k`` docs
    per query under the pinned integer-BM25 dialect. Docs matching no
    query term never appear; queries matching nothing yield no rows."""
    from hickoryspark.ops.postings import token_positions

    occ = token_positions(docs, text_col)
    qt = _query_terms(queries)
    # prune occurrences to QUERY TERMS before any aggregation — the
    # full (doc, term) tf rollup would shuffle the entire postings
    # relation per query batch; dl must stay corpus-wide (doc length
    # counts every token) but map-side-combines to one row per doc
    terms = F.broadcast(qt.select("term").distinct())
    tf = (occ.join(terms, "term", "left_semi")
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    dl = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl"))
    scalars = (docs.join(dl, "doc_id", "left")
               .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                    F.sum(F.coalesce(F.col("dl"), F.lit(0)))
                    .cast("long").alias("total_tokens"))
               .withColumn("avgdl",
                           F.expr("total_tokens div n_docs")))

    # df over the already-pruned tf relation (query terms only)
    qdf = (tf.groupBy("term")
           .agg(F.count_distinct("doc_id").cast("long").alias("df")))

    matched = (qt.join(tf, "term")
               .join(qdf, "term")
               .join(dl, "doc_id")
               .crossJoin(F.broadcast(scalars)))
    contrib = F.expr(
        "(1000 * 22 * avgdl * tf * (2 * n_docs - 2 * df + 1)) div "
        "((2 * df + 1) * (10 * avgdl * tf + 3 * avgdl + 9 * dl))")
    scored = (matched.select("query_id", "doc_id",
                             contrib.alias("c"))
              .groupBy("query_id", "doc_id")
              .agg(F.sum("c").cast("long").alias("score_milli")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_milli").desc(), F.col("doc_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w)
                              .cast("long"))
            .where(F.col("rank") <= top_k))


def duckdb_bm25_sql(docs_rel: str, queries_values: str,
                    top_k: int = 10) -> str:
    """Full DuckDB mirror: ``docs_rel`` must expose (doc_id, text);
    ``queries_values`` is a VALUES list ``(query_id, query)``. Same
    tokenization, same integer arithmetic, same tie rule."""
    return f"""
        WITH q(query_id, query) AS (VALUES {queries_values}),
        qt AS (
          SELECT DISTINCT query_id, t.term
          FROM q, unnest(list_filter(
            regexp_split_to_array(query, '{ASCII_WS_SPLIT_RE}'),
            s -> s != '')) AS t(term)),
        occ AS (
          SELECT doc_id, t.term
          FROM {docs_rel}, unnest(list_filter(
            regexp_split_to_array(text, '{ASCII_WS_SPLIT_RE}'),
            s -> s != '')) AS t(term)),
        tf AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM occ GROUP BY doc_id, term),
        dl AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
          FROM occ GROUP BY doc_id),
        scalars AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS total_tokens,
                 CAST(COALESCE(SUM(dl), 0) // COUNT(*) AS BIGINT)
                     AS avgdl
          FROM {docs_rel} d LEFT JOIN dl USING (doc_id)),
        qdf AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM tf WHERE term IN (SELECT term FROM qt)
          GROUP BY term),
        scored AS (
          SELECT qt.query_id, tf.doc_id,
                 CAST(SUM(
                   (1000 * 22 * s.avgdl * tf.tf
                    * (2 * s.n_docs - 2 * qdf.df + 1))
                   // ((2 * qdf.df + 1)
                       * (10 * s.avgdl * tf.tf + 3 * s.avgdl
                          + 9 * dl.dl))
                 ) AS BIGINT) AS score_milli
          FROM qt
          JOIN tf USING (term) JOIN qdf USING (term)
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN scalars s
          GROUP BY qt.query_id, tf.doc_id),
        ranked AS (
          SELECT query_id, doc_id, score_milli,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score_milli DESC, doc_id ASC) AS BIGINT)
                     AS rank
          FROM scored)
        SELECT query_id, doc_id, score_milli, rank
        FROM ranked WHERE rank <= {top_k}"""


def phrase_match(docs: DataFrame, phrases: DataFrame,
                 text_col: str = "text") -> DataFrame:
    """Positional phrase search: docs(doc_id, text) x
    phrases(phrase_id, phrase) -> (doc_id, phrase_id, n_matches,
    first_pos) — one row per (doc, phrase) with at least one EXACT
    consecutive-token occurrence of the phrase, counted over the
    shared ASCII-whitespace tokenization.

    Pinned semantics: a phrase with tokens p_0..p_{L-1} matches doc
    positions s where token(s + o) == p_o for every offset o
    (overlapping occurrences each count — 'x x' in 'x x x' matches
    twice); phrases that tokenize to nothing yield no rows;
    ``first_pos`` is the smallest matching start.

    Scale shape: the phrase-term table (phrase_id, offset, term,
    phrase_len) is query-sized and BROADCASTS into the token-
    occurrence join, so only occurrences of phrase terms ever leave
    the scan; candidate starts aggregate by (doc, phrase, start) —
    a start is a match iff it covers all ``phrase_len`` DISTINCT
    offsets — then roll up per (doc, phrase). Both aggregations share
    the (doc_id, phrase_id, ...) key prefix, so the second groupBy
    reuses the first's exchange. No windows, no Python."""
    from hickoryspark.ops.postings import token_positions

    toks = F.filter(
        F.split(F.col("phrase"), ASCII_WS_SPLIT_RE), lambda t: t != "")
    pt = phrases.select(
        "phrase_id",
        F.size(toks).cast("long").alias("phrase_len"),
        F.posexplode(toks).alias("offset", "term"),
    )
    occ = token_positions(docs, text_col)
    starts = occ.join(F.broadcast(pt), "term").select(
        "doc_id", "phrase_id", "phrase_len",
        (F.col("pos") - F.col("offset")).alias("start"),
        "offset",
    ).where(F.col("start") >= 0)
    full = (
        starts.groupBy("doc_id", "phrase_id", "start")
        .agg(
            F.count_distinct("offset").alias("_k"),
            F.max("phrase_len").alias("_len"),
        )
        .where(F.col("_k") == F.col("_len"))
    )
    return full.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("start").cast("long").alias("first_pos"),
    )


def duckdb_phrase_sql(docs_rel: str, phrases_values: str) -> str:
    """Full DuckDB mirror of :func:`phrase_match`: ``phrases_values``
    is a VALUES list ``(phrase_id, phrase)``; same tokenization, same
    distinct-offset coverage rule."""
    return f"""
        WITH p(phrase_id, phrase) AS (VALUES {phrases_values}),
        ptok AS (
          SELECT phrase_id,
                 list_filter(regexp_split_to_array(
                   phrase, '{ASCII_WS_SPLIT_RE}'), s -> s != '') AS lst
          FROM p),
        pt AS (
          SELECT phrase_id, CAST(len(lst) AS BIGINT) AS phrase_len,
                 i - 1 AS off, lst[i] AS term
          FROM ptok, unnest(range(1, len(lst) + 1)) AS u(i)),
        tok AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(
                   text, '{ASCII_WS_SPLIT_RE}'), s -> s != '') AS lst
          FROM {docs_rel}),
        occ AS (
          SELECT doc_id, i - 1 AS pos, lst[i] AS term
          FROM tok, unnest(range(1, len(lst) + 1)) AS u(i)),
        starts AS (
          SELECT occ.doc_id, pt.phrase_id, pt.phrase_len,
                 occ.pos - pt.off AS start, pt.off
          FROM occ JOIN pt USING (term)
          WHERE occ.pos - pt.off >= 0),
        full_starts AS (
          SELECT doc_id, phrase_id, start
          FROM starts
          GROUP BY doc_id, phrase_id, start
          HAVING COUNT(DISTINCT off) = MAX(phrase_len))
        SELECT doc_id, phrase_id,
               CAST(COUNT(*) AS BIGINT) AS n_matches,
               CAST(MIN(start) AS BIGINT) AS first_pos
        FROM full_starts GROUP BY doc_id, phrase_id"""


def phrase_snippets(docs: DataFrame, phrases: DataFrame,
                    window: int = 3,
                    text_col: str = "text") -> DataFrame:
    """KWIC (keyword-in-context) snippets: for each (doc, phrase)
    match from :func:`phrase_match`, the token window around the
    FIRST occurrence — ``window`` tokens of left context, the phrase,
    ``window`` tokens of right context, space-joined.

    Scale shape: snippets are sliced only for MATCHED (doc, phrase)
    rows (the phrase_match output, usually tiny) — the token arrays
    are re-built ONLY for matched docs (a left-semi prune of the
    corpus on the match set precedes the tokenize, so the full corpus
    is never re-tokenized for a handful of hits), then one doc_id
    equi-join; the slice is a per-row array op. No windows, no
    Python."""
    m = phrase_match(docs, phrases, text_col)

    toks_arr = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE), lambda t: t != "")
    doc_toks = docs.join(
        m.select("doc_id"), "doc_id", "left_semi"
    ).select("doc_id", toks_arr.alias("_toks"))

    ptoks = F.filter(
        F.split(F.col("phrase"), ASCII_WS_SPLIT_RE), lambda t: t != "")
    plen = phrases.select(
        "phrase_id", F.size(ptoks).cast("long").alias("_plen"))
    start = F.greatest(F.col("first_pos") - window, F.lit(0))
    length = (F.col("first_pos") + F.col("_plen") + window) - start
    joined = (
        m.join(F.broadcast(plen), "phrase_id")
        .join(doc_toks, "doc_id")
    )
    snippet = F.array_join(
        F.slice(F.col("_toks"), (start + 1).cast("int"),
                length.cast("int")),
        " ")
    return joined.select(
        "doc_id", "phrase_id", "first_pos", snippet.alias("snippet"))


def duckdb_snippets_sql(docs_rel: str, phrases_values: str,
                        window: int = 3) -> str:
    """Full DuckDB mirror of :func:`phrase_snippets` (same phrase
    program, 1-based inclusive list slicing)."""
    inner = duckdb_phrase_sql(docs_rel, phrases_values)
    return f"""
        WITH pm AS ({inner}),
        plen AS (
          SELECT phrase_id,
                 CAST(len(list_filter(regexp_split_to_array(
                   phrase, '{ASCII_WS_SPLIT_RE}'), s -> s != ''))
                   AS BIGINT) AS plen
          FROM (SELECT * FROM (VALUES {phrases_values})
                AS v(phrase_id, phrase))),
        dtoks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(
                   text, '{ASCII_WS_SPLIT_RE}'), s -> s != '') AS toks
          FROM {docs_rel})
        SELECT pm.doc_id, pm.phrase_id, pm.first_pos,
               COALESCE(array_to_string(
                 dtoks.toks[
                   CAST(GREATEST(pm.first_pos - {window}, 0) + 1
                        AS BIGINT) :
                   CAST(pm.first_pos + plen.plen + {window}
                        AS BIGINT)],
                 ' '), '') AS snippet
        FROM pm JOIN plen USING (phrase_id)
        JOIN dtoks USING (doc_id)"""


def rrf_fuse(rankings: DataFrame, k: int = 60,
             query_col: str = "query_id", doc_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) of several
    per-query rankings — the standard way to merge BM25 with a
    dense/ANN retriever without score calibration.

    Pinned exact-integer dialect: each input row contributes
    ``1_000_000 div (k + rank)`` micro-points (rank 1-based);
    contributions sum per (query, doc) across all sources (BIGINT —
    order-independent), and ``fused_rank`` orders by (score DESC,
    doc ASC) — the deterministic tie rule.

    Output: ``(query_id, doc_id, rrf_score_micro, fused_rank)``.
    Scale shape: one (query, doc) groupBy + one per-QUERY window —
    bounded by that query's candidate union, never corpus-wide."""
    if k < 0:
        raise ValueError("k must be >= 0")
    from pyspark.sql import Window

    # ranks are 1-based by contract; NULL / < 1 rows are invalid and
    # DROPPED on both engines (Spark's div would silently NULL the
    # contribution while DuckDB's // would raise at k + rank = 0)
    contrib = rankings.where(F.col(rank_col) >= 1).select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.expr(f"1000000 div ({int(k)} + {rank_col})").alias("_c"),
    )
    agg = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("_c").cast("long").alias("rrf_score_micro"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score_micro").desc(), F.col("doc_id").asc())
    return agg.withColumn(
        "fused_rank", F.row_number().over(w).cast("long"))


def duckdb_rrf_sql(rankings_rel: str, k: int = 60) -> str:
    """Full DuckDB mirror of :func:`rrf_fuse`; ``rankings_rel``
    exposes (query_id, doc_id, rank)."""
    return f"""
        WITH agg AS (
          SELECT query_id, doc_id,
                 CAST(SUM(1000000 // ({int(k)} + rank)) AS BIGINT)
                   AS rrf_score_micro
          FROM {rankings_rel} WHERE rank >= 1 GROUP BY 1, 2)
        SELECT query_id, doc_id, rrf_score_micro,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY rrf_score_micro DESC, doc_id ASC)
                   AS BIGINT) AS fused_rank
        FROM agg"""


def retrieval_metrics(rankings: DataFrame, qrels: DataFrame,
                      k: int = 10,
                      query_col: str = "query_id",
                      doc_col: str = "doc_id",
                      rank_col: str = "rank") -> DataFrame:
    """Per-query ranking quality against labeled qrels — exact
    integer milli-points: ``(query_id, n_rel, n_rel_at_k,
    p_at_k_milli, rr_milli)`` where ``rr_milli`` = 1000 div (rank of
    the FIRST relevant doc within the top k; 0 when none) and
    ``p_at_k_milli`` = 1000 * n_rel_at_k div k. Queries appear iff
    they have >= 1 qrel row; ``qrels`` is (query_id, doc_id) —
    presence means relevant.

    Scale shape: qrels equi-join (broadcast when small) + one query
    groupBy; the full corpus never shuffles."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # dedupe to the BEST rank per (query, doc): a doc ranked twice
    # within k (multi-source rankings) must count once, or the qrels
    # left-join fans out and inflates n_rel / p@k
    top = (
        rankings.where(F.col(rank_col) <= k)
        .groupBy(F.col(query_col).alias("query_id"),
                 F.col(doc_col).alias("doc_id"))
        .agg(F.min(rank_col).alias("_rank"))
    )
    q = qrels.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
    ).distinct()
    hits = q.join(top, ["query_id", "doc_id"], "left")
    agg = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel"),
        F.count("_rank").cast("long").alias("n_rel_at_k"),
        F.min("_rank").alias("_first"),
    )
    return agg.select(
        "query_id", "n_rel", "n_rel_at_k",
        F.expr(f"1000 * n_rel_at_k div {int(k)}")
        .alias("p_at_k_milli"),
        F.coalesce(F.expr("1000 div _first"), F.lit(0))
        .cast("long").alias("rr_milli"),
    )


def duckdb_retrieval_metrics_sql(rankings_rel: str, qrels_rel: str,
                                 k: int = 10) -> str:
    """Full DuckDB mirror of :func:`retrieval_metrics`."""
    return f"""
        WITH q AS (SELECT DISTINCT query_id, doc_id FROM {qrels_rel}),
        top AS (SELECT query_id, doc_id, MIN(rank) AS rank
                FROM {rankings_rel}
                WHERE rank <= {int(k)} GROUP BY 1, 2),
        hits AS (
          SELECT q.query_id, q.doc_id, top.rank
          FROM q LEFT JOIN top
            ON q.query_id = top.query_id AND q.doc_id = top.doc_id),
        agg AS (
          SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel,
                 CAST(COUNT(rank) AS BIGINT) AS n_rel_at_k,
                 MIN(rank) AS first_rank
          FROM hits GROUP BY 1)
        SELECT query_id, n_rel, n_rel_at_k,
               1000 * n_rel_at_k // {int(k)} AS p_at_k_milli,
               CAST(COALESCE(1000 // first_rank, 0) AS BIGINT)
                 AS rr_milli
        FROM agg"""


def mine_hard_negatives(docs: DataFrame, queries: DataFrame,
                        positives: DataFrame, k: int = 5,
                        pool_extra: int = 3,
                        text_col: str = "text") -> DataFrame:
    """DPR-style hard-negative mining (Karpukhin et al. 2020): for
    each training query, the top-BM25 documents that are NOT the
    query's known positives — the negatives that actually teach a
    dense retriever something.

    ``positives`` is (query_id, doc_id). Pinned: the candidate pool
    is the BM25 top ``k + pool_extra`` (a query with more than
    ``pool_extra`` positives inside its pool may yield fewer than k
    negatives — documented bound, never wrong rows); survivors keep
    BM25 order, re-ranked 1..k as ``neg_rank``.

    Scale shape: everything heavy is :func:`bm25_scores` (postings
    pruned to query terms before aggregation); the positive
    exclusion is one anti-join on (query_id, doc_id) and the re-rank
    windows over per-query pools of ≤ k+pool_extra rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if pool_extra < 0:
        raise ValueError("pool_extra must be >= 0")
    from pyspark.sql.window import Window

    pool = bm25_scores(docs, queries, text_col,
                       top_k=k + pool_extra)
    negs = pool.join(
        positives.select("query_id", "doc_id"),
        ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy("rank")
    return (
        negs.withColumn("neg_rank",
                        F.row_number().over(w).cast("long"))
        .where(F.col("neg_rank") <= k)
        .select("query_id", "doc_id", "score_milli", "neg_rank")
    )


def duckdb_hard_negatives_sql(docs_rel: str, queries_values: str,
                              positives_rel: str, k: int = 5,
                              pool_extra: int = 3) -> str:
    """DuckDB mirror of :func:`mine_hard_negatives`;
    ``positives_rel`` must expose (query_id, doc_id)."""
    pool = duckdb_bm25_sql(docs_rel, queries_values,
                           top_k=k + pool_extra)
    return f"""
        SELECT query_id, doc_id, score_milli,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY rank) AS BIGINT)
                 AS neg_rank
        FROM ({pool}) hn_pool
        WHERE NOT EXISTS (
          SELECT 1 FROM {positives_rel} p
          WHERE p.query_id = hn_pool.query_id
            AND p.doc_id = hn_pool.doc_id)
        QUALIFY neg_rank <= {int(k)}"""


#: MMR relevance weight lambda in milli (Carbonell & Goldstein 1998
#: use 0.3-0.7; 0.7 favors relevance).
DEFAULT_MMR_LAMBDA_MILLI = 700


def mmr_rerank(candidates: DataFrame, sims: DataFrame, k: int = 5,
               lambda_milli: int = DEFAULT_MMR_LAMBDA_MILLI) -> DataFrame:
    """Maximal Marginal Relevance diversified reranking (Carbonell &
    Goldstein, SIGIR 1998) over per-query candidate pools:
    ``(query_id, rank, doc_id, mmr_milli)``, ``rank`` 1-based in pick
    order.

    ``candidates`` exposes (query_id, doc_id, rel_milli) — e.g. the
    :func:`bm25_scores` top pool; ``sims`` exposes
    (query_id, a, b, sim_milli) pairwise candidate similarities in
    milli (either or both orientations — symmetrized internally; a
    missing pair means similarity 0). Exact-integer dialect (the
    readability/pagerank rule): round ``r`` picks, per query, the
    remaining candidate maximizing

        ``lambda_milli * rel_milli - (1000 - lambda_milli) * max_sim``

    where ``max_sim`` is the max ``sim_milli`` against the docs picked
    in rounds < r (0 in round 1 — pure relevance). Ties break on
    smallest doc_id. Queries with fewer than ``k`` candidates emit
    fewer rows.

    Scale shape: candidate pools are top-N per query — tiny relative
    to the corpus — so the picked set (≤ k rows/query) broadcasts into
    each round's anti-join and similarity lookup at runtime via AQE.
    The picked frame feeds TWO joins per round, so it is
    localCheckpoint-ed every round (the kcore lesson: persist caches
    data but not the logical plan, and analysis time grows
    exponentially otherwise).
    """
    lam = int(lambda_milli)
    com = 1000 - lam
    cand = candidates.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rel_milli").cast("long").alias("rel_milli"))
    s0 = sims.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("sim_milli").cast("long").alias("sim_milli"))
    ms = s0.unionByName(s0.select(
        "query_id", F.col("b").alias("a"), F.col("a").alias("b"),
        "sim_milli"))
    selected = None
    for r in range(1, int(k) + 1):
        if selected is None:
            scored = cand.withColumn("mx", F.lit(0).cast("long"))
        else:
            rem = cand.join(selected.select("query_id", "doc_id"),
                            ["query_id", "doc_id"], "left_anti")
            selsim = (
                ms.join(
                    selected.select(F.col("query_id").alias("sq"),
                                    F.col("doc_id").alias("sd")),
                    (F.col("query_id") == F.col("sq"))
                    & (F.col("a") == F.col("sd")))
                .select("query_id", F.col("b").alias("doc_id"),
                        "sim_milli"))
            scored = (
                rem.join(selsim, ["query_id", "doc_id"], "left")
                .groupBy("query_id", "doc_id", "rel_milli")
                .agg(F.coalesce(F.max("sim_milli"),
                                F.lit(0)).cast("long").alias("mx")))
        pick = (
            scored
            .withColumn("score",
                        (F.lit(lam) * F.col("rel_milli")
                         - F.lit(com) * F.col("mx")).cast("long"))
            .groupBy("query_id")
            .agg(F.max(F.struct(
                F.col("score").alias("score"),
                (-F.col("doc_id")).alias("nd"))).alias("m"))
            .select(
                "query_id",
                F.lit(r).cast("long").alias("rank"),
                (-F.col("m.nd")).cast("long").alias("doc_id"),
                F.col("m.score").cast("long").alias("mmr_milli")))
        selected = (pick if selected is None
                    else selected.unionByName(pick))
        selected = selected.localCheckpoint(eager=True)
    return selected.select("query_id", "rank", "doc_id", "mmr_milli")


def duckdb_mmr_sql(cand_rel: str, sims_rel: str, k: int = 5,
                   lambda_milli: int = DEFAULT_MMR_LAMBDA_MILLI) -> str:
    """DuckDB mirror of :func:`mmr_rerank` — the round recurrence
    unrolled one CTE pair per pick (the bpe_merges pattern).
    ``cand_rel`` exposes (query_id, doc_id, rel_milli); ``sims_rel``
    exposes (query_id, a, b, sim_milli)."""
    lam = int(lambda_milli)
    com = 1000 - lam
    ctes = [
        f"mmr_c AS (SELECT CAST(query_id AS BIGINT) AS query_id,"
        f" CAST(doc_id AS BIGINT) AS doc_id,"
        f" CAST(rel_milli AS BIGINT) AS rel_milli FROM {cand_rel})",
        f"mmr_s AS (SELECT CAST(query_id AS BIGINT) AS query_id,"
        f" CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,"
        f" CAST(sim_milli AS BIGINT) AS sim_milli FROM {sims_rel}"
        f" UNION ALL SELECT CAST(query_id AS BIGINT),"
        f" CAST(b AS BIGINT), CAST(a AS BIGINT),"
        f" CAST(sim_milli AS BIGINT) FROM {sims_rel})",
    ]
    for r in range(1, int(k) + 1):
        if r == 1:
            scored = ("SELECT query_id, doc_id, rel_milli,"
                      " CAST(0 AS BIGINT) AS mx FROM mmr_c")
        else:
            prev = f"mmr_sel{r - 1}"
            scored = f"""
              SELECT c.query_id, c.doc_id, c.rel_milli,
                     COALESCE(MAX(mm.sim_milli), 0) AS mx
              FROM (SELECT * FROM mmr_c c0
                    WHERE NOT EXISTS (
                      SELECT 1 FROM {prev} s
                      WHERE s.query_id = c0.query_id
                        AND s.doc_id = c0.doc_id)) c
              LEFT JOIN (SELECT m.query_id, m.b, m.sim_milli
                         FROM mmr_s m JOIN {prev} s
                           ON s.query_id = m.query_id
                          AND s.doc_id = m.a) mm
                ON mm.query_id = c.query_id AND mm.b = c.doc_id
              GROUP BY c.query_id, c.doc_id, c.rel_milli"""
        ctes.append(f"""
          mmr_pick{r} AS (
            SELECT query_id, CAST({r} AS BIGINT) AS rank, doc_id,
                   CAST({lam} * rel_milli - {com} * mx AS BIGINT)
                     AS mmr_milli
            FROM ({scored}) sc{r}
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY query_id
              ORDER BY {lam} * rel_milli - {com} * mx DESC,
                       doc_id) = 1)""")
        body = (f"SELECT * FROM mmr_pick{r}" if r == 1 else
                f"SELECT * FROM mmr_sel{r - 1}"
                f" UNION ALL SELECT * FROM mmr_pick{r}")
        ctes.append(f"mmr_sel{r} AS ({body})")
    return ("WITH " + ", ".join(ctes)
            + f" SELECT query_id, rank, doc_id, mmr_milli"
              f" FROM mmr_sel{int(k)}")


#: BM25F default field weights (title boosted over body — Robertson,
#: Zaragoza & Taylor CIKM 2004's simple weighted-field variant)
DEFAULT_BM25F_FIELDS = (("title", 3), ("text", 1))


def bm25f_scores(docs: DataFrame, queries: DataFrame,
                 fields=DEFAULT_BM25F_FIELDS,
                 top_k: int = 10) -> DataFrame:
    """Fielded BM25 (BM25F, the weighted-field variant of Robertson
    et al. CIKM 2004): per-term tf and doc length become WEIGHTED
    sums across fields (``wtf = sum_f w_f * tf_f``, ``wdl = sum_f
    w_f * len_f``), then the pinned integer-BM25 contribution formula
    applies unchanged with (wtf, wdl, weighted avgdl). df counts docs
    where ANY field contains the term. Integer weights keep every
    quantity BIGINT-exact; same output shape and tie rule as
    :func:`bm25_scores`.

    Scale shape mirrors bm25_scores: query terms broadcast into the
    per-field postings before any aggregation, so only matching rows
    shuffle; per-field dl rollups are map-side combinable; corpus
    scalars are one tiny agg crossed in; NULL fields count as empty.
    """
    from hickoryspark.ops.postings import token_positions

    qt = _query_terms(queries)
    terms = F.broadcast(qt.select("term").distinct())
    wtf = None
    wdl = None
    for fname, w in fields:
        fdocs = docs.select(
            "doc_id", F.coalesce(F.col(fname), F.lit("")).alias("_f"))
        occ = token_positions(fdocs, "_f")
        ftf = (occ.join(terms, "term", "left_semi")
               .groupBy("doc_id", "term")
               .agg((F.lit(int(w)) * F.count(F.lit(1)))
                    .cast("long").alias("wtf")))
        fdl = occ.groupBy("doc_id").agg(
            (F.lit(int(w)) * F.count(F.lit(1)))
            .cast("long").alias("wdl"))
        wtf = ftf if wtf is None else wtf.unionByName(ftf)
        wdl = fdl if wdl is None else wdl.unionByName(fdl)
    wtf = wtf.groupBy("doc_id", "term").agg(
        F.sum("wtf").cast("long").alias("tf"))
    wdl = wdl.groupBy("doc_id").agg(
        F.sum("wdl").cast("long").alias("dl"))
    scalars = (docs.join(wdl, "doc_id", "left")
               .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                    F.sum(F.coalesce(F.col("dl"), F.lit(0)))
                    .cast("long").alias("total_tokens"))
               .withColumn("avgdl",
                           F.expr("total_tokens div n_docs")))
    qdf = (wtf.groupBy("term")
           .agg(F.count_distinct("doc_id").cast("long").alias("df")))
    matched = (qt.join(wtf, "term")
               .join(qdf, "term")
               .join(wdl, "doc_id")
               .crossJoin(F.broadcast(scalars)))
    contrib = F.expr(
        "(1000 * 22 * avgdl * tf * (2 * n_docs - 2 * df + 1)) div "
        "((2 * df + 1) * (10 * avgdl * tf + 3 * avgdl + 9 * dl))")
    scored = (matched.select("query_id", "doc_id", contrib.alias("c"))
              .groupBy("query_id", "doc_id")
              .agg(F.sum("c").cast("long").alias("score_milli")))
    w_ = Window.partitionBy("query_id").orderBy(
        F.col("score_milli").desc(), F.col("doc_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w_)
                              .cast("long"))
            .where(F.col("rank") <= top_k))


def duckdb_bm25f_sql(docs_rel: str, queries_values: str,
                     fields=DEFAULT_BM25F_FIELDS,
                     top_k: int = 10) -> str:
    """Full DuckDB mirror of :func:`bm25f_scores`; ``docs_rel`` must
    expose (doc_id, <field columns>)."""
    occ_arms = " UNION ALL ".join(
        f"SELECT doc_id, t.term, CAST({int(w)} AS BIGINT) AS w"
        f" FROM {docs_rel}, unnest(list_filter("
        f" regexp_split_to_array(COALESCE({fname}, ''),"
        f" '{ASCII_WS_SPLIT_RE}'), s -> s != '')) AS t(term)"
        for fname, w in fields)
    return f"""
        WITH q(query_id, query) AS (VALUES {queries_values}),
        qt AS (
          SELECT DISTINCT query_id, t.term
          FROM q, unnest(list_filter(
            regexp_split_to_array(query, '{ASCII_WS_SPLIT_RE}'),
            s -> s != '')) AS t(term)),
        occf AS ({occ_arms}),
        tf AS (
          SELECT doc_id, term, CAST(SUM(w) AS BIGINT) AS tf
          FROM occf GROUP BY doc_id, term),
        dl AS (
          SELECT doc_id, CAST(SUM(w) AS BIGINT) AS dl
          FROM occf GROUP BY doc_id),
        scalars AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS total_tokens,
                 CAST(COALESCE(SUM(dl), 0) // COUNT(*) AS BIGINT)
                     AS avgdl
          FROM {docs_rel} d LEFT JOIN dl USING (doc_id)),
        qdf AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM tf WHERE term IN (SELECT term FROM qt)
          GROUP BY term),
        scored AS (
          SELECT qt.query_id, tf.doc_id,
                 CAST(SUM(
                   (1000 * 22 * s.avgdl * tf.tf
                    * (2 * s.n_docs - 2 * qdf.df + 1))
                   // ((2 * qdf.df + 1)
                       * (10 * s.avgdl * tf.tf + 3 * s.avgdl
                          + 9 * dl.dl))
                 ) AS BIGINT) AS score_milli
          FROM qt
          JOIN tf USING (term) JOIN qdf USING (term)
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN scalars s
          GROUP BY qt.query_id, tf.doc_id),
        ranked AS (
          SELECT query_id, doc_id, score_milli,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score_milli DESC, doc_id ASC) AS BIGINT)
                     AS rank
          FROM scored)
        SELECT query_id, doc_id, score_milli, rank
        FROM ranked WHERE rank <= {int(top_k)}"""


def expand_queries(docs: DataFrame, queries: DataFrame,
                   fb_k: int = 5, n_terms: int = 8) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio 1971 /
    RM1-style): take each query's top ``fb_k`` BM25 docs as assumed-
    relevant feedback, rank their vocabulary by feedback frequency,
    and emit the top ``n_terms`` NEW terms per query:
    ``(query_id, term, weight_milli, exp_rank)``.

    Pinned exact-integer dialect: ``weight_milli = (1000 * sum_tf)
    div fb_len`` where ``sum_tf`` sums the term's tf over the
    feedback docs and ``fb_len`` is their total token count — the
    feedback language model P(t|R) in milli (RM1 without the
    query-likelihood doc weighting; a documented pinned choice).
    Original query terms are EXCLUDED (Rocchio's expansion-only
    delta); ties rank by term ascending.

    Scale shape: the feedback set is ``fb_k`` docs per query — tiny —
    so it broadcasts into the postings join and only feedback-doc
    token rows ever aggregate; the per-query top-``n_terms`` window
    runs on the pruned (query, term) grain."""
    from hickoryspark.ops.postings import token_positions

    fb = bm25_scores(docs, queries, top_k=fb_k).select(
        "query_id", "doc_id")
    occ = token_positions(docs, "text")
    # prune to FEEDBACK-DOC rows before any aggregation (the
    # bm25_scores lesson: Catalyst will not push an inner join below
    # an aggregate, so aggregating first would shuffle the entire
    # postings relation); sum-of-per-doc-tf == row count of the
    # joined occurrence rows, so no per-doc rollup is needed at all
    fbocc = occ.join(F.broadcast(fb), "doc_id")
    fb_tf = (fbocc.groupBy("query_id", "term")
             .agg(F.count(F.lit(1)).cast("long").alias("sum_tf")))
    fb_len = (fbocc.groupBy("query_id")
              .agg(F.count(F.lit(1)).cast("long").alias("fb_len")))
    qt = _query_terms(queries)
    fresh = fb_tf.join(qt, ["query_id", "term"], "left_anti")
    scored = (fresh.join(fb_len, "query_id")
              .select("query_id", "term",
                      F.expr("(1000 * sum_tf) div fb_len")
                      .cast("long").alias("weight_milli")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("weight_milli").desc(), F.col("term").asc())
    return (scored.withColumn("exp_rank", F.row_number().over(w)
                              .cast("long"))
            .where(F.col("exp_rank") <= n_terms))


def duckdb_expand_sql(docs_rel: str, queries_values: str,
                      fb_k: int = 5, n_terms: int = 8) -> str:
    """Full DuckDB mirror of :func:`expand_queries`."""
    bm25 = duckdb_bm25_sql(docs_rel, queries_values, top_k=fb_k)
    return f"""
        WITH exp_fb AS (
          SELECT query_id, doc_id FROM ({bm25}) exp_bm25),
        exp_q(query_id, query) AS (VALUES {queries_values}),
        exp_qt AS (
          SELECT DISTINCT query_id, t.term
          FROM exp_q, unnest(list_filter(
            regexp_split_to_array(query, '{ASCII_WS_SPLIT_RE}'),
            s -> s != '')) AS t(term)),
        exp_occ AS (
          SELECT doc_id, t.term
          FROM {docs_rel}, unnest(list_filter(
            regexp_split_to_array(text, '{ASCII_WS_SPLIT_RE}'),
            s -> s != '')) AS t(term)),
        exp_tf AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM exp_occ GROUP BY doc_id, term),
        exp_dl AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
          FROM exp_occ GROUP BY doc_id),
        exp_fbtf AS (
          SELECT f.query_id, t.term,
                 CAST(SUM(t.tf) AS BIGINT) AS sum_tf
          FROM exp_tf t JOIN exp_fb f USING (doc_id)
          GROUP BY f.query_id, t.term),
        exp_fblen AS (
          SELECT f.query_id, CAST(SUM(d.dl) AS BIGINT) AS fb_len
          FROM exp_dl d JOIN exp_fb f USING (doc_id)
          GROUP BY f.query_id),
        exp_scored AS (
          SELECT ft.query_id, ft.term,
                 CAST((1000 * ft.sum_tf) // fl.fb_len AS BIGINT)
                     AS weight_milli
          FROM exp_fbtf ft JOIN exp_fblen fl USING (query_id)
          WHERE NOT EXISTS (
            SELECT 1 FROM exp_qt q
            WHERE q.query_id = ft.query_id AND q.term = ft.term))
        SELECT query_id, term, weight_milli,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY weight_milli DESC, term ASC) AS BIGINT)
                   AS exp_rank
        FROM exp_scored
        QUALIFY exp_rank <= {int(n_terms)}"""
