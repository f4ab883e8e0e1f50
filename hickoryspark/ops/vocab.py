"""Corpus vocabulary statistics — the one-row rollup every corpus
datasheet carries: token/type counts, hapax mass, type-token ratio.

Built over ops/postings.term_stats (same tokenization, same df/cf
notions), so the numbers are consistent with the index the corpus
ships with.

Pinned exact-integer dialect (oracle-reproducible):

- ``n_docs`` counts input rows; ``n_tokens`` = sum(cf);
  ``n_types`` = distinct terms; ``n_hapax`` = terms with cf = 1;
  ``n_singleton_df`` = terms appearing in exactly one doc;
- ``ttr_milli = (1000 * n_types) div greatest(n_tokens, 1)`` and
  ``hapax_milli = (1000 * n_hapax) div greatest(n_types, 1)`` — the
  corpus-quality signals (a scraped corpus with collapsing TTR is
  boilerplate-heavy; exploding hapax mass is mojibake/OCR noise).

Scale shape: term_stats is one map-side-combinable aggregation; this
adds a second all-to-one rollup of the (small) term relation plus a
1-row count of docs — no windows, no joins beyond the final 1x1
cross, pure JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["vocab_stats", "duckdb_vocab_sql",
           "stopword_candidates", "duckdb_stopwords_sql",
           "vocab_growth", "duckdb_vocab_growth_sql"]


def vocab_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row: ``(n_docs, n_tokens, n_types, n_hapax,
    n_singleton_df, ttr_milli, hapax_milli)``."""
    from hickoryspark.ops.postings import term_stats

    terms = term_stats(docs, text_col)
    vocab = terms.agg(
        F.coalesce(F.sum("cf"), F.lit(0)).cast("long")
        .alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("cf") == 1).cast("long")).cast("long")
        .alias("n_hapax"),
        F.sum((F.col("df") == 1).cast("long")).cast("long")
        .alias("n_singleton_df"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        n_docs.crossJoin(F.broadcast(vocab))
        .select(
            "n_docs", "n_tokens", "n_types",
            F.coalesce("n_hapax", F.lit(0)).cast("long")
            .alias("n_hapax"),
            F.coalesce("n_singleton_df", F.lit(0)).cast("long")
            .alias("n_singleton_df"),
        )
        .withColumn(
            "ttr_milli",
            F.expr("(1000 * n_types) div greatest(n_tokens, 1)")
            .cast("long"),
        )
        .withColumn(
            "hapax_milli",
            F.expr("(1000 * n_hapax) div greatest(n_types, 1)")
            .cast("long"),
        )
    )


def duckdb_vocab_sql(docs_rel: str) -> str:
    """Full DuckDB mirror — same tokenization and arithmetic."""
    return f"""
        WITH occ AS (
          SELECT doc_id, t.term
          FROM {docs_rel}, unnest(list_filter(
            regexp_split_to_array(text, '{ASCII_WS_SPLIT_RE}'),
            s -> s != '')) AS t(term)),
        ts AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
                 CAST(COUNT(*) AS BIGINT) AS cf
          FROM occ GROUP BY term),
        v AS (
          SELECT CAST(COALESCE(SUM(cf), 0) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(COALESCE(SUM(CASE WHEN cf = 1 THEN 1 END), 0)
                      AS BIGINT) AS n_hapax,
                 CAST(COALESCE(SUM(CASE WHEN df = 1 THEN 1 END), 0)
                      AS BIGINT) AS n_singleton_df
          FROM ts),
        ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
                  FROM {docs_rel})
        SELECT n_docs, n_tokens, n_types, n_hapax, n_singleton_df,
               CAST((1000 * n_types) // greatest(n_tokens, 1)
                    AS BIGINT) AS ttr_milli,
               CAST((1000 * n_hapax) // greatest(n_types, 1)
                    AS BIGINT) AS hapax_milli
        FROM ndocs, v"""


def stopword_candidates(docs: DataFrame, text_col: str = "text",
                        min_df_milli: int = 500) -> DataFrame:
    """Corpus-specific stopword induction: ``(term, df, cf,
    df_milli)`` for every term present in at least ``min_df_milli``
    per-mille of all docs (``df * 1000 >= min_df_milli * n_docs``),
    ``df_milli = (1000 * df) div n_docs``.

    THRESHOLD-based on purpose — a global top-k rank of the vocab
    would funnel the whole term relation through one task; the df
    cut is a map-side filter against one broadcast scalar."""
    from hickoryspark.ops.postings import term_stats

    terms = term_stats(docs, text_col)
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        terms.crossJoin(F.broadcast(n_docs))
        .where(F.col("df") * 1000 >= int(min_df_milli)
               * F.col("n_docs"))
        .select(
            "term", "df", "cf",
            F.expr("(1000 * df) div n_docs").cast("long")
            .alias("df_milli"),
        )
    )


def duckdb_stopwords_sql(docs_rel: str, min_df_milli: int = 500) -> str:
    """Full DuckDB mirror of :func:`stopword_candidates`."""
    return f"""
        WITH occ AS (
          SELECT doc_id, t.term
          FROM {docs_rel}, unnest(list_filter(
            regexp_split_to_array(text, '{ASCII_WS_SPLIT_RE}'),
            s -> s != '')) AS t(term)),
        ts AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
                 CAST(COUNT(*) AS BIGINT) AS cf
          FROM occ GROUP BY term),
        ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
                  FROM {docs_rel})
        SELECT term, df, cf,
               CAST((1000 * df) // n_docs AS BIGINT) AS df_milli
        FROM ts, ndocs
        WHERE df * 1000 >= {int(min_df_milli)} * n_docs"""


def vocab_growth(docs: DataFrame,
                 checkpoints: tuple[int, ...] = (
                     100, 1000, 10000, 100000, 1000000),
                 text_col: str = "text", id_col: str = "doc_id",
                 num_partitions: int | None = None) -> DataFrame:
    """Heaps-law vocabulary growth curve: ``(n_tokens_seen,
    n_types)`` — distinct types among the corpus's first n tokens —
    at each checkpoint. The datasheet curve (sub-linear growth is
    healthy prose; a near-linear curve betrays mojibake/OCR noise or
    id-bearing boilerplate) and the tokenizer-budget planning input.

    Pinned semantics: corpus token order is (doc_id asc, position
    within doc); tokenization = ASCII-whitespace split with empties
    dropped, positions counted over KEPT tokens, 1-based globally.
    A checkpoint beyond the corpus length reports the full type
    count (the curve flattens, it never truncates).

    Scale shape: the global token ordinal is a two-phase prefix sum
    over DETERMINISTIC id-derived buckets — ``bucket = (doc_id -
    min_id) div width`` with width from one tiny min/max aggregation
    — local running sums per bucket, ONE tiny window over the
    per-bucket totals (rows = #buckets), broadcast join back; no
    window ever scans token- or doc-grain data globally. The bucket
    is a pure function of doc_id, NOT ``repartitionByRange`` +
    ``spark_partition_id()``: range boundaries are SAMPLED per
    execution with an rdd-id-dependent seed, so the running-sum
    branch and the totals branch of the join can materialize under
    DIFFERENT boundaries once column pruning splits their exchanges
    (observed at sf0.1: ordinals shifted by a partition's worth of
    tokens). Types aggregate with one token-keyed groupBy (map-side
    combinable); the checkpoint counts are conditional sums in ONE
    single-row aggregation (no join against the checkpoint list)."""
    if not checkpoints:
        raise ValueError("checkpoints must be non-empty")
    from pyspark.sql.window import Window

    toks = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE),
        lambda x: x != "")
    base = docs.select(
        F.col(id_col).cast("long").alias("_did"), toks.alias("_toks"),
        F.size(toks).cast("long").alias("_n"))
    n_parts = (num_partitions
               or base.sparkSession.sparkContext.defaultParallelism)
    bounds = base.agg(F.min("_did").alias("lo"),
                      F.max("_did").alias("hi")).collect()[0]
    if bounds["lo"] is None:
        width = 1
    else:
        span = bounds["hi"] - bounds["lo"] + 1
        width = max(1, -(-span // max(1, n_parts)))
    lo = bounds["lo"] if bounds["lo"] is not None else 0
    part = base.withColumn(
        "_pid", F.expr(f"(_did - {int(lo)}L) div {int(width)}L"))
    w_loc = (Window.partitionBy("_pid").orderBy("_did")
             .rowsBetween(Window.unboundedPreceding, -1))
    loc = part.withColumn(
        "_before", F.coalesce(F.sum("_n").over(w_loc), F.lit(0)))
    totals = loc.groupBy("_pid").agg(F.sum("_n").alias("_tot"))
    w_off = (Window.partitionBy().orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    tok_rows = (
        loc.join(F.broadcast(offsets), "_pid")
        .select((F.col("_off") + F.col("_before")).alias("_doc_off"),
                F.posexplode("_toks").alias("_p", "_tok"))
        .select(F.col("_tok"),
                (F.col("_doc_off") + F.col("_p") + 1).alias("_gpos"))
    )
    firsts = tok_rows.groupBy("_tok").agg(
        F.min("_gpos").alias("_first"))
    cps = sorted(int(c) for c in checkpoints)
    aggs = [
        F.coalesce(F.sum((F.col("_first") <= cp).cast("long")),
                   F.lit(0)).cast("long").alias(f"_c{i}")
        for i, cp in enumerate(cps)
    ]
    row = firsts.agg(*aggs)
    stack = ", ".join(f"CAST({cp} AS BIGINT), _c{i}"
                      for i, cp in enumerate(cps))
    return row.select(F.expr(
        f"stack({len(cps)}, {stack}) AS (n_tokens_seen, n_types)"))


def duckdb_vocab_growth_sql(docs_rel: str,
                            checkpoints: tuple[int, ...] = (
                                100, 1000, 10000, 100000, 1000000),
                            text_col: str = "text",
                            id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`vocab_growth` (global cumulative sum
    instead of the two-phase split — byte-identical ordinals)."""
    ws = ("'[ ' || chr(9) || chr(10) || chr(11) || chr(12) || "
          "chr(13) || ']+'")
    cps = sorted(int(c) for c in checkpoints)
    rows = " UNION ALL ".join(
        f"SELECT CAST({cp} AS BIGINT) AS n_tokens_seen,"
        f" (SELECT CAST(COALESCE(SUM(CASE WHEN first_pos <= {cp}"
        f" THEN 1 ELSE 0 END), 0) AS BIGINT) FROM vg_first)"
        f" AS n_types"
        for cp in cps)
    return f"""
        WITH vg_d AS (
          SELECT {id_col} AS did,
                 list_filter(regexp_split_to_array({text_col}, {ws}),
                             x -> x <> '') AS toks
          FROM {docs_rel}
        ), vg_off AS (
          SELECT did, toks,
                 COALESCE(SUM(len(toks)) OVER (ORDER BY did
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS doc_off
          FROM vg_d
        ), vg_tok AS (
          SELECT doc_off + generate_subscripts(toks, 1) AS gpos,
                 unnest(toks) AS tok
          FROM vg_off
        ), vg_first AS (
          SELECT tok, MIN(gpos) AS first_pos FROM vg_tok GROUP BY tok
        )
        {rows}"""
