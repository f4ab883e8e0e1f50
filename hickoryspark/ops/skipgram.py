"""Skip-gram training-pair generation (word2vec, Mikolov et al.
NeurIPS 2013) — the (center, context) pair stream an embedding
trainer consumes, including the paper's frequency subsampling:
frequent-word occurrences drop with probability 1 - sqrt(t/f), and
pairs form over the COMPACTED stream (dropping "the" widens every
window that crossed it — the effect subsampling exists for).

Pinned semantics (oracle-reproducible):

- tokens: ``split(text, ' ')`` verbatim, positions 1-based;
- keep an occurrence iff ``md5('sg:' || doc_id || ':' || pos || ':'
  || tok)`` permille < ``floor(1000 * sqrt(N / (1000 * cnt)))`` with
  t pinned to 1/1000 — the ratio is one integer-exact division, and
  division/sqrt/multiply are correctly-rounded IEEE doubles (the
  temperature_sample rule), so thresholds match across engines; a
  word at or under corpus frequency t keeps every occurrence
  (threshold >= 1000 — no special case);
- surviving tokens re-rank per doc (document order); DIRECTED pairs
  (center, context) for every |rank gap| in 1..window, aggregated to
  ``(center, context, n_pairs)``.

Scale shape: one explode + one token-frequency aggregation joined
back (never a per-token window); per-doc re-ranking is a doc-grain
window (frames bounded by document length); pair formation is one
TRUE equi-join on (doc_id, rank + delta) per forward offset (a
doc-only join with a residual gap filter would materialize the full
per-doc cross product — the join_ngrams O(tokens^2) ban), mirrored
pairs by column swap, then one aggregation with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["skipgram_pairs", "duckdb_skipgram_sql"]

_SALT = "sg:"


def skipgram_pairs(
    docs: DataFrame, window: int = 2, text_col: str = "text"
) -> DataFrame:
    """-> (center, context, n_pairs): subsampled directed pairs."""
    toks = F.split(F.col(text_col), " ")
    t = docs.select(
        "doc_id", F.posexplode(toks).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    freq = t.groupBy("tok").agg(F.count(F.lit(1)).alias("_cnt"))
    n_total = t.agg(F.count(F.lit(1)).alias("_n"))
    thr = (
        freq.crossJoin(F.broadcast(n_total))
        .select(
            F.col("tok").alias("_f_tok"),
            F.floor(
                1000.0
                * F.sqrt(
                    F.col("_n").cast("double")
                    / (1000 * F.col("_cnt")).cast("double")
                )
            ).cast("long").alias("_thr"),
        )
    )
    # shared 24-bit md5 permille draw (sampling._hash_permille):
    # salt 'sg' + key 'doc:pos:tok' composes to the pinned
    # 'sg:doc:pos:tok' md5 input
    from hickoryspark.ops.sampling import _hash_permille

    h = _hash_permille(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"),
            F.col("pos").cast("string"), F.lit(":"), F.col("tok"),
        ),
        "sg",
    )
    kept = (
        t.join(thr, t["tok"] == thr["_f_tok"])
        .where(h < F.col("_thr"))
        .select("doc_id", "pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    # 2*window join legs consume this frame with DIFFERENT join keys
    # (rank vs rank-delta), so their exchanges cannot be reused and
    # each leg would re-run the explode + frequency join + window —
    # localCheckpoint (eager) pins one materialization
    ranked = kept.withColumn(
        "rank", F.row_number().over(w)
    ).localCheckpoint(eager=True)
    # pair formation as TRUE equi-joins on (doc_id, rank + delta) —
    # a doc_id-only join with a residual gap filter materializes the
    # full per-doc cross product (the join_ngrams O(tokens^2) ban);
    # one equi-join per forward offset, mirrored pairs by swapping
    a = ranked.select(
        "doc_id", F.col("rank").alias("_ra"), F.col("tok").alias("center")
    )
    fwd = None
    for delta in range(1, window + 1):
        b = ranked.select(
            "doc_id",
            (F.col("rank") - delta).alias("_ra"),
            F.col("tok").alias("context"),
        )
        j = a.join(b, ["doc_id", "_ra"]).select("center", "context")
        fwd = j if fwd is None else fwd.unionByName(j)
    both = fwd.unionByName(
        fwd.select(
            F.col("context").alias("center"), F.col("center").alias("context")
        )
    )
    return (
        both.groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def duckdb_skipgram_sql(
    docs_rel: str, window: int = 2, text_col: str = "text"
) -> str:
    """Full mirror: identical salt, threshold arithmetic, and join."""
    return f"""
        WITH t AS (
          SELECT doc_id, i AS pos, toks[i] AS tok
          FROM (SELECT doc_id, string_split({text_col}, ' ') AS toks
                FROM {docs_rel}),
               unnest(range(1, len(toks) + 1)) AS r(i)),
        freq AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok),
        ntot AS (SELECT COUNT(*) AS n FROM t),
        thr AS (SELECT f.tok,
                       CAST(FLOOR(1000.0 * SQRT(CAST(ntot.n AS DOUBLE)
                              / CAST(1000 * f.cnt AS DOUBLE)))
                            AS BIGINT) AS thr
                FROM freq f, ntot),
        kept AS (
          SELECT t.doc_id, t.pos, t.tok,
                 ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                    ORDER BY t.pos) AS rank
          FROM t JOIN thr ON t.tok = thr.tok
          WHERE ('0x' || substr(md5('{_SALT}' || t.doc_id || ':'
                                    || t.pos || ':' || t.tok),
                                1, 6))::BIGINT % 1000 < thr.thr)
        SELECT a.tok AS center, b.tok AS context,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM kept a JOIN kept b
          ON a.doc_id = b.doc_id
         AND b.rank <> a.rank
         AND abs(b.rank - a.rank) <= {window}
        GROUP BY 1, 2"""
