"""RAKE keyword extraction — Rapid Automatic Keyword Extraction.

Rose et al. 2010: candidate keyphrases are the maximal runs of
content words between stopword/punctuation boundaries; each word
scores ``deg(w)/freq(w)`` over the document's candidate set and a
phrase scores the sum of its words. Complements ops/keywords.py
(TF-IDF — corpus-statistical) and ops/textrank.py (sentence-graph):
RAKE is the document-local phrase miner, the cheap first pass of
keyword pipelines.

Pinned EXACT-INTEGER dialect:

- tokens = ASCII-whitespace split; each token is CANONICALIZED by
  stripping non-alphanumeric runs from both ends (``[^A-Za-z0-9]+``
  anchored ^ and \\z — interior hyphens/apostrophes survive);
- a position is a BOUNDARY iff its canonical form is empty (pure
  punctuation) or its ASCII-lowercase form is in ``STOPWORDS``
  (a pinned 40-word English function-word list — ASCII-only, so the
  Java-vs-RE2 Unicode case-fold divergence cannot engage);
- candidates = maximal boundary-free runs, length <= ``max_len``
  (longer runs are dropped — the classic RAKE cap);
- per doc: ``freq(w)`` = occurrences of canonical w among candidate
  words, ``deg(w)`` = Σ of the containing phrase's length over those
  occurrences (co-occurrence degree including self);
- ``score_milli(phrase)`` = Σ over word OCCURRENCES of
  ``(1000 * deg(w)) div freq(w)`` — one integer division per word,
  order-independent integer sum;
- output = top ``k`` phrases per doc, score desc then phrase asc.

Scale shape: one posexplode, ONE per-doc window (the running
boundary count — token grain but doc-bounded, the textrank
precedent), groupBys keyed by (doc, phrase/word), and a top-k window
over per-doc candidate phrases. No Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["rake_keywords", "duckdb_rake_sql", "STOPWORDS"]

STOPWORDS = (
    "a an and are as at be but by for from has have in is it its of "
    "on or that the this to was were will with not no if then than "
    "so such these those there here when where who which what over "
    "under into onto out up down about after before between through "
    "during against above below again once only own same too very "
    "can just should now"
).split()

_EDGE_RE = r"^[^A-Za-z0-9]+|[^A-Za-z0-9]+$"
# \z-anchored tail for the shared-regex rule; ^ head is safe (no
# multiline), but spell the tail explicitly for RE2/Java agreement
_EDGE_RE = r"(^[^A-Za-z0-9]+)|([^A-Za-z0-9]+\z)"


def rake_keywords(docs: DataFrame, k: int = 5, max_len: int = 4,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """docs → ``(doc_id, phrase, score_milli, rank)`` — the top-k
    RAKE keyphrases per document."""
    if k < 1 or max_len < 1:
        raise ValueError("k and max_len must be >= 1")
    from pyspark.sql.window import Window

    toks = F.filter(F.split(F.col(text_col), ASCII_WS_SPLIT_RE),
                    lambda t: t != "")
    pos = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(toks).alias("_p", "_raw"),
    ).select(
        "_d", "_p",
        F.regexp_replace("_raw", _EDGE_RE, "").alias("_w"),
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    boundary = (F.col("_w") == "") | F.array_contains(
        stop_arr, F.lower(F.col("_w")))
    w_doc = Window.partitionBy("_d").orderBy("_p")
    marked = pos.withColumn(
        "_pid", F.sum(boundary.cast("long")).over(w_doc))
    words = marked.where(~boundary)
    phrases = (
        words.groupBy("_d", "_pid")
        .agg(F.array_sort(F.collect_list(F.struct("_p", "_w")))
             .alias("_ws"))
        .withColumn("_len", F.size("_ws").cast("long"))
        .where(F.col("_len") <= max_len)
        .select(
            "_d", "_pid", "_len",
            F.array_join(F.transform("_ws", lambda s: s["_w"]), " ")
            .alias("phrase"),
            F.explode(F.transform("_ws", lambda s: s["_w"]))
            .alias("_w"),
        )
    )
    stats = phrases.groupBy("_d", "_w").agg(
        F.count(F.lit(1)).cast("long").alias("_freq"),
        F.sum("_len").cast("long").alias("_deg"))
    scored = (
        phrases.join(stats, ["_d", "_w"])
        .groupBy("_d", "_pid", "phrase")
        .agg(F.sum(F.expr("(1000 * _deg) div _freq")).cast("long")
             .alias("score_milli"))
    )
    # identical phrases from different runs collapse, scores summed?
    # NO — pinned: each RUN is its own candidate; dedup keeps the
    # best-scoring instance (they tie by construction, the rank
    # window's phrase-asc tie handles it)
    w_rank = Window.partitionBy("_d").orderBy(
        F.col("score_milli").desc(), F.col("phrase").asc(),
        F.col("_pid").asc())
    return (
        scored.withColumn("rank",
                          F.row_number().over(w_rank).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("_d").alias(id_col), "phrase", "score_milli",
                "rank")
    )


def duckdb_rake_sql(docs_rel: str, k: int = 5, max_len: int = 4,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`rake_keywords`."""
    ws = ("'[ ' || chr(9) || chr(10) || chr(11) || chr(12) || "
          "chr(13) || ']+'")
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
        WITH rk_pos AS (
          SELECT {id_col} AS d, i AS p,
                 regexp_replace(t[i],
                   '(^[^A-Za-z0-9]+)|([^A-Za-z0-9]+\\z)', '', 'g')
                   AS w
          FROM (SELECT {id_col}, list_filter(
                  regexp_split_to_array({text_col}, {ws}),
                  x -> x <> '') AS t FROM {docs_rel}),
               unnest(range(1, len(t) + 1)) AS u(i)
        ), rk_mark AS (
          SELECT d, p, w,
                 (w = '' OR lower(w) IN ({stops})) AS b
          FROM rk_pos
        ), rk_run AS (
          SELECT d, p, w,
                 SUM(CASE WHEN b THEN 1 ELSE 0 END)
                   OVER (PARTITION BY d ORDER BY p) AS pid, b
          FROM rk_mark
        ), rk_phrase AS (
          SELECT d, pid,
                 CAST(COUNT(*) AS BIGINT) AS plen,
                 string_agg(w, ' ' ORDER BY p) AS phrase,
                 list(w ORDER BY p) AS wlist
          FROM rk_run WHERE NOT b
          GROUP BY d, pid
          HAVING COUNT(*) <= {int(max_len)}
        ), rk_words AS (
          SELECT d, pid, plen, phrase, unnest(wlist) AS w
          FROM rk_phrase
        ), rk_stats AS (
          SELECT d, w, CAST(COUNT(*) AS BIGINT) AS freq,
                 CAST(SUM(plen) AS BIGINT) AS deg
          FROM rk_words GROUP BY d, w
        ), rk_scored AS (
          SELECT x.d, x.pid, x.phrase,
                 CAST(SUM((1000 * s.deg) // s.freq) AS BIGINT)
                   AS score_milli
          FROM rk_words x JOIN rk_stats s
            ON x.d = s.d AND x.w = s.w
          GROUP BY x.d, x.pid, x.phrase
        )
        SELECT d AS {id_col}, phrase, score_milli,
               CAST(ROW_NUMBER() OVER (PARTITION BY d
                 ORDER BY score_milli DESC, phrase ASC, pid ASC)
                 AS BIGINT) AS rank
        FROM rk_scored
        QUALIFY rank <= {int(k)}"""
