"""TextRank sentence ranking — extractive summarization scores.

Mihalcea & Tarau (EMNLP 2004): build a per-document sentence graph
weighted by lexical overlap and run PageRank on it; the top-ranked
sentences form the extractive summary. Corpus pipelines use the
scores to pick preview/snippet sentences and to build summarization
training pairs at scale.

Pinned EXACT-INTEGER dialect (the repo's graph-op rule — float
power iteration can't be hash-compared across engines):

- sentences from :func:`hickoryspark.ops.sentences.split_sentences`
  (the pinned boundary rule), capped at ``max_sentences`` per doc —
  the cap bounds the quadratic pair stage;
- tokens = ASCII-whitespace split, empties dropped, DISTINCT within
  a sentence, NO case folding (Java and RE2/DuckDB disagree on
  Unicode case edges — İ — so raw tokens are the portable choice);
- edge weight w(i,j) = |shared distinct tokens|, pairs with w=0
  absent (the standard log-length normalization is replaced by the
  weighted-degree division below — all-integer);
- power iteration, per doc:
  ``r_0 = scale div n_sents``,
  ``r_{k+1}(i) = tele + Σ_j (r_k(j)*damping_pct*w(j,i))
  div (100*W(j))`` with ``W(j) = Σ w(j,·)`` and
  ``tele = (scale*(100-damping_pct)//100) div n_sents``; isolated
  sentences hold teleport mass only. Dangling/floor simplifications
  as in ops/graph.pagerank, mirrored exactly by the oracle.

Scale shape: the pair build is a token-keyed self-join WITHIN a doc
(bounded by the sentence cap), each iteration is one groupBy +
equi-joins keyed by (doc, sentence) — per-doc graphs never cross
partitions once shuffled by doc_id. The sentence/key frames persist
(they feed every round); rounds are fixed and small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE
from hickoryspark.ops.sentences import DUCKDB_SENTENCES_SQL, split_sentences

__all__ = ["textrank_sentences", "duckdb_textrank_sql"]


def textrank_sentences(docs: DataFrame, rounds: int = 3,
                       damping_pct: int = 85, scale: int = 10**9,
                       max_sentences: int = 100,
                       text_col: str = "text") -> DataFrame:
    """docs → ``(doc_id, sent_pos, rank_e9)`` after ``rounds``
    exact-integer TextRank iterations per document."""
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be 0..100")
    if max_sentences < 1:
        raise ValueError("max_sentences must be >= 1")
    sents = (
        split_sentences(docs, text_col)
        .where(F.col("sent_pos") <= max_sentences)
        .select("doc_id", "sent_pos", "sentence")
        .persist()
    )
    toks = sents.select(
        "doc_id", "sent_pos",
        F.explode(F.array_distinct(F.filter(
            F.split(F.col("sentence"), ASCII_WS_SPLIT_RE),
            lambda t: t != ""))).alias("tok"),
    )
    a = toks.select(F.col("doc_id").alias("d"),
                    F.col("sent_pos").alias("i"), "tok")
    b = toks.select(F.col("doc_id").alias("d2"),
                    F.col("sent_pos").alias("j"),
                    F.col("tok").alias("tok2"))
    pairs = (
        a.join(b, (a["d"] == b["d2"]) & (a["tok"] == b["tok2"])
               & (a["i"] < b["j"]))
        .groupBy("d", "i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    und = pairs.select("d", F.col("i").alias("e_src"),
                       F.col("j").alias("e_dst"), "w").unionAll(
        pairs.select("d", F.col("j").alias("e_src"),
                     F.col("i").alias("e_dst"), "w"))
    und = und.persist()
    wt = und.groupBy("d", "e_src").agg(F.sum("w").alias("tw"))
    n = sents.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("ns"))
    keys = sents.join(n, "doc_id").select(
        "doc_id", "sent_pos", "ns").persist()
    tele_num = scale * (100 - damping_pct) // 100
    ranks = keys.select(
        "doc_id", "sent_pos",
        F.expr(f"cast({scale} as bigint) div ns").alias("rank"))
    for k in range(rounds):
        r_in = ranks.select(F.col("doc_id").alias("r_d"),
                            F.col("sent_pos").alias("r_s"),
                            F.col("rank").alias("r_rank"))
        contrib = (
            und.join(wt, ["d", "e_src"])
            .join(r_in, (F.col("d") == F.col("r_d"))
                  & (F.col("e_src") == F.col("r_s")))
            .select(
                "d", "e_dst",
                F.expr(f"(r_rank * {damping_pct} * w)"
                       f" div (100 * tw)").alias("_c"),
            )
        )
        sums = contrib.groupBy("d", "e_dst").agg(
            F.sum("_c").alias("_in"))
        ranks = (
            keys.join(sums, (keys["doc_id"] == sums["d"])
                      & (keys["sent_pos"] == sums["e_dst"]), "left")
            .select(
                "doc_id", "sent_pos",
                (F.expr(f"cast({tele_num} as bigint) div ns")
                 + F.coalesce(F.col("_in"), F.lit(0)))
                .cast("long").alias("rank"),
            )
        )
        if (k + 1) % 10 == 0 and k + 1 < rounds:
            ranks = ranks.localCheckpoint()
    return ranks.select("doc_id", "sent_pos",
                        F.col("rank").alias("rank_e9"))


def duckdb_textrank_sql(src: str, rounds: int = 3,
                        damping_pct: int = 85, scale: int = 10**9,
                        max_sentences: int = 100) -> str:
    """DuckDB mirror: the sentences SQL mirror feeding the
    recurrence unrolled one CTE per round. ``src`` is a relation
    exposing (doc_id, text)."""
    sents = "WITH " + DUCKDB_SENTENCES_SQL.format(src=src)
    ws = "'[ ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13) || ']+'"
    tele_num = scale * (100 - damping_pct) // 100
    sql = f"""
        WITH tr_sents AS (
          SELECT doc_id, sent_pos, sentence FROM ({sents})
          WHERE sent_pos <= {int(max_sentences)}
        ), tr_tok AS (
          SELECT DISTINCT doc_id, sent_pos, tok FROM (
            SELECT doc_id, sent_pos,
                   unnest(list_filter(string_split_regex(sentence,
                          {ws}), x -> x <> '')) AS tok
            FROM tr_sents)
        ), tr_pair AS (
          SELECT a.doc_id AS d, a.sent_pos AS i, b.sent_pos AS j,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM tr_tok a JOIN tr_tok b
            ON a.doc_id = b.doc_id AND a.tok = b.tok
               AND a.sent_pos < b.sent_pos
          GROUP BY 1, 2, 3
        ), tr_und AS (
          SELECT d, i AS e_src, j AS e_dst, w FROM tr_pair
          UNION ALL SELECT d, j, i, w FROM tr_pair
        ), tr_wt AS (
          SELECT d, e_src, SUM(w) AS tw FROM tr_und GROUP BY 1, 2
        ), tr_n AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ns
          FROM tr_sents GROUP BY 1
        ), tr_r0 AS (
          SELECT s.doc_id, s.sent_pos, {int(scale)} // n.ns AS rank
          FROM tr_sents s JOIN tr_n n USING (doc_id))"""
    for k in range(1, rounds + 1):
        sql += f""",
        tr_r{k} AS (
          SELECT s.doc_id, s.sent_pos,
                 {int(tele_num)} // n.ns
                 + COALESCE(SUM((r.rank * {int(damping_pct)} * e.w)
                                // (100 * t.tw)), 0) AS rank
          FROM tr_sents s JOIN tr_n n USING (doc_id)
          LEFT JOIN tr_und e ON e.d = s.doc_id
                            AND e.e_dst = s.sent_pos
          LEFT JOIN tr_wt t ON t.d = e.d AND t.e_src = e.e_src
          LEFT JOIN tr_r{k - 1} r ON r.doc_id = e.d
                                 AND r.sent_pos = e.e_src
          GROUP BY s.doc_id, s.sent_pos, n.ns)"""
    return sql + f"""
        SELECT doc_id, sent_pos, CAST(rank AS BIGINT) AS rank_e9
        FROM tr_r{rounds}"""
