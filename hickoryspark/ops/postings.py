"""Inverted-index construction — per-term posting lists with token
positions, and corpus term statistics.

The classic IR build step (and the retrieval half of a training-data
pipeline: sparse BM25-style retrieval, term-based corpus slicing,
keyword auditing). The reference engine has no equivalent; this
extends the §2 surface the same way ops/terms.py does.

Pinned semantics (oracle-reproducible):

- TOKENS are the ASCII-whitespace-split words of ``text`` with empty
  strings removed (ops/chunking.py ``ASCII_WS_SPLIT_RE`` — shared
  verbatim with the RE2 mirror; NO case folding, the ops/terms.py
  rule);
- a token's POSITION is its 0-based index in the FILTERED token
  sequence (standard IR term offsets — empties never occupy a slot);
- a posting row is ``(term, doc_id, tf, positions)`` where
  ``positions`` is the ascending comma-joined position list (a plain
  string so the gate hash stays primitive-typed — CLAUDE.md rule);
- ``position_cap`` (optional) keeps only the FIRST ``cap`` positions
  per posting (``tf`` still counts all); emitted truncation is never
  silent — ``n_positions`` carries the kept count.

Scale shape: the postings relation is fully RELATIONAL — no giant
per-term cells, ever (a stopword's posting "list" is millions of
(term, doc) ROWS, each bounded by one document's own token count; the
term-level rollup is a map-side-combinable aggregation, never a
``collect_list`` across documents). One explode → one (doc, term)
groupBy whose ``collect_list`` frame is bounded by a single doc's own
occurrences of a single term; ``term_stats`` partial-aggregates
map-side. No window over ``partitionBy(term)`` anywhere (the
ops/terms.py stopword-funnel lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["token_positions", "build_postings", "term_stats"]


def token_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, pos, term)`` — one row per token occurrence, 0-based
    position in the filtered token sequence."""
    toks = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE), lambda t: t != ""
    )
    return docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "term")
    )


def build_postings(docs: DataFrame, text_col: str = "text",
                   position_cap: int | None = None) -> DataFrame:
    """The postings relation: ``(term, doc_id, tf, n_positions,
    positions)`` — ``positions`` ascending, comma-joined; truncated to
    ``position_cap`` entries when set (``tf`` is never truncated)."""
    occ = token_positions(docs, text_col)
    pos_arr = F.array_sort(F.collect_list("pos"))
    if position_cap is not None:
        if position_cap < 1:
            raise ValueError("position_cap must be >= 1")
        pos_arr = F.slice(pos_arr, 1, int(position_cap))
    return (
        occ.groupBy("term", "doc_id")
        .agg(
            F.count("*").cast("long").alias("tf"),
            pos_arr.alias("_pos"),
        )
        .select(
            "term", "doc_id", "tf",
            F.size("_pos").cast("long").alias("n_positions"),
            F.array_join(F.transform(F.col("_pos"),
                                     lambda p: p.cast("string")),
                         ",").alias("positions"),
        )
    )


def term_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus term statistics: ``(term, df, cf)`` — document frequency
    (distinct docs) and collection frequency (total occurrences)."""
    return (
        token_positions(docs, text_col)
        .groupBy("term")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("df"),
            F.count("*").cast("long").alias("cf"),
        )
    )


#: varint (LEB128-style, 7 payload bits per byte) size thresholds
_VARINT_STEPS = [(1 << 7, 1), (1 << 14, 2), (1 << 21, 3),
                 (1 << 28, 4), (1 << 35, 5)]


def _varint_bytes(gap):
    expr = F.lit(6).cast("long")
    for bound, nbytes in reversed(_VARINT_STEPS):
        expr = F.when(gap < bound, F.lit(nbytes).cast("long")) \
                .otherwise(expr)
    return expr


def postings_gap_cost(docs: DataFrame,
                      text_col: str = "text") -> DataFrame:
    """Index-compression planning: per-term delta-gap varint cost
    ``(term, df, gap_bytes, bits_per_doc_milli)``.

    Pinned coding model: the doc-id posting list sorts ascending,
    each entry stores the gap to its predecessor (the first stores
    ``doc_id + 1`` so id 0 stays encodable) as a 7-bit-per-byte
    varint; ``bits_per_doc_milli = (8000 * gap_bytes) div df`` — the
    classic inverted-index budget figure (dense stopword lists cost
    ~8-9 bits/doc, rare terms the full 5 bytes).

    Scale shape: one distinct on (term, doc_id), then ONE window per
    term ordered by doc_id — the posting list itself, the inherent
    unit of this computation — and one per-term aggregation. Gaps of
    any magnitude are covered (ids beyond 2^35-1 take the 6-byte
    ceiling row rather than overflowing the CASE chain)."""
    from pyspark.sql.window import Window

    pd_ = (
        token_positions(docs, text_col)
        .select("term", "doc_id").distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = pd_.withColumn(
        "_gap",
        F.coalesce(F.col("doc_id") - F.lag("doc_id").over(w),
                   F.col("doc_id") + 1).cast("long"))
    return (
        gaps.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum(_varint_bytes(F.col("_gap"))).cast("long")
            .alias("gap_bytes"),
        )
        .select(
            "term", "df", "gap_bytes",
            F.expr("(8000 * gap_bytes) div df").cast("long")
            .alias("bits_per_doc_milli"),
        )
    )


def duckdb_gap_cost_sql(docs_rel: str, text_col: str = "text") -> str:
    """DuckDB mirror of :func:`postings_gap_cost` (lag and sum split
    across CTEs — window calls cannot nest)."""
    ws = ("'[ ' || chr(9) || chr(10) || chr(11) || chr(12) || "
          "chr(13) || ']+'")
    case = "CASE " + " ".join(
        f"WHEN gap < {bound} THEN {nbytes}"
        for bound, nbytes in _VARINT_STEPS) + " ELSE 6 END"
    return f"""
        WITH gc_tok AS (
          SELECT DISTINCT doc_id, unnest(list_filter(
            regexp_split_to_array({text_col}, {ws}), x -> x <> ''))
            AS term
          FROM {docs_rel}
        ), gc_gap AS (
          SELECT term,
                 COALESCE(doc_id - lag(doc_id) OVER (
                   PARTITION BY term ORDER BY doc_id), doc_id + 1)
                   AS gap
          FROM gc_tok
        ), gc_agg AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
                 CAST(SUM({case}) AS BIGINT) AS gap_bytes
          FROM gc_gap GROUP BY term)
        SELECT term, df, gap_bytes,
               CAST((8000 * gap_bytes) // df AS BIGINT)
                 AS bits_per_doc_milli
        FROM gc_agg"""
