"""Benchmark decontamination — flag corpus documents sharing token
n-grams with an evaluation/benchmark set (the GPT-3 appendix-C rule:
a training document is contaminated if any of its 13-grams collides
with a benchmark 13-gram; short benchmark items fall back to their
full token sequence).

Pinned dialect (oracle-reproducible):

- tokens = the shared ASCII-whitespace split with empties removed
  (ops/chunking.ASCII_WS_SPLIT_RE); NO case folding or punctuation
  stripping — the repo-wide tokenization, not GPT-3's lossy fold;
- a benchmark item with >= n tokens contributes its distinct
  n-grams; one with 1..n-1 tokens contributes ONE gram: its whole
  token sequence (space-joined); zero-token items contribute nothing;
- a corpus doc matches a gram of token-length L iff that exact
  space-joined window occurs among ITS length-L windows (grams are
  token sequences — tokens cannot contain spaces, so the string is a
  bijective encoding and no cross-length collision is possible);
- output: one row per CONTAMINATED corpus doc —
  ``(doc_id, n_hit_grams, n_bench_docs)`` with distinct-gram and
  distinct-benchmark-item counts; clean docs yield no row.

Scale shape: the benchmark set is small by definition — its distinct
(gram, bench_id) relation BROADCASTS into the corpus gram stream, so
only colliding grams ever shuffle (one groupBy on doc_id). Corpus
grams are built LINEARLY (ops.dedup.join_ngrams) and deduplicated
per doc BEFORE the join. The set of short benchmark lengths (at most
n-1 values) is collected driver-side to instantiate the extra
corpus gram widths; every such width costs one more pass over the
corpus token arrays — rare in practice (real benchmarks are longer
than n tokens) and logged nowhere silently: the op raises if the
bench side is empty of tokens entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE
from hickoryspark.ops.dedup import join_ngrams

__all__ = ["canary_hits", "duckdb_canary_sql",
           "decontaminate", "duckdb_decontam_sql",
           "benchmark_ngrams", "ngram_overlap"]


def _toks(text_col: str):
    return F.filter(F.split(F.col(text_col), ASCII_WS_SPLIT_RE),
                    lambda t: t != "")


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hit_grams, n_bench_docs) for every corpus doc whose
    length-L windows collide with a benchmark gram (L = n, or the
    benchmark item's full length when shorter)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bt = bench.select(
        F.col(bench_id_col).alias("bench_id"),
        _toks(bench_text_col).alias("toks"),
    ).where(F.size("toks") >= 1)
    glen = F.least(F.lit(n), F.size("toks"))
    # at most n-1 extra widths; bench is broadcast-class so this
    # collect is bounded (and the widths themselves are < n)
    lengths = sorted(
        r["L"] for r in bt.select(glen.alias("L")).distinct().collect()
    )

    def grams_at(df, id_col, length):
        return df.where(glen == length).select(
            F.col(id_col),
            F.explode(
                F.array_distinct(join_ngrams(F.col("toks"), length))
            ).alias("gram"),
        )

    ct = corpus.select(
        F.col("doc_id"), _toks(text_col).alias("toks"))
    hits = None
    for length in lengths:
        bg = F.broadcast(
            bt.where(glen == length)
            .select(
                "bench_id",
                F.explode(
                    F.array_distinct(join_ngrams(F.col("toks"), length))
                ).alias("gram"),
            )
            .distinct()
        )
        cg = ct.select(
            "doc_id",
            F.explode(
                F.array_distinct(join_ngrams(F.col("toks"), length))
            ).alias("gram"),
        )
        h = cg.join(bg, "gram")
        hits = h if hits is None else hits.unionByName(h)
    if hits is None:
        raise ValueError("benchmark set has no tokenizable items")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct("gram").cast("long").alias("n_hit_grams"),
            F.count_distinct("bench_id").cast("long")
            .alias("n_bench_docs"),
        )
    )


def duckdb_decontam_sql(
    corpus_rel: str, bench_rel: str, n: int = 13
) -> str:
    """Full DuckDB mirror. ``corpus_rel`` exposes (doc_id, text),
    ``bench_rel`` (bench_id, text). Unlike the Spark side the widths
    are resolved inside SQL (a lateral join on the bench lengths) —
    an independent formulation of the same pinned rule."""
    ws = f"'{ASCII_WS_SPLIT_RE}'"
    return f"""
        WITH bt AS (
          SELECT bench_id,
                 list_filter(regexp_split_to_array(text, {ws}),
                             x -> x <> '') AS toks
          FROM {bench_rel}
        ), bg AS (
          SELECT DISTINCT bench_id,
                 least({n}, len(toks)) AS L,
                 array_to_string(toks[i : i + least({n}, len(toks)) - 1],
                                 ' ') AS gram
          FROM bt, unnest(range(1, len(toks)
                                   - least({n}, len(toks)) + 2)) AS u(i)
          WHERE len(toks) >= 1
        ), widths AS (
          SELECT DISTINCT L FROM bg
        ), ct AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, {ws}),
                             x -> x <> '') AS toks
          FROM {corpus_rel}
        ), cg AS (
          SELECT DISTINCT doc_id, L,
                 array_to_string(toks[i : i + L - 1], ' ') AS gram
          FROM ct, widths, unnest(range(1, len(toks) - L + 2)) AS u(i)
        )
        SELECT cg.doc_id,
               CAST(COUNT(DISTINCT cg.gram) AS BIGINT) AS n_hit_grams,
               CAST(COUNT(DISTINCT bg.bench_id) AS BIGINT)
                   AS n_bench_docs
        FROM cg JOIN bg ON bg.gram = cg.gram AND bg.L = cg.L
        GROUP BY cg.doc_id"""


# --------------------------------------------------------------------------
# distinct-gram overlap counting (the original API of this module —
# restored after the 13-gram window rewrite above accidentally dropped
# it; the decontam_overlap gate and its oracle pin these semantics)

def benchmark_ngrams(benchmark: DataFrame, n: int = 13,
                     text_col: str = "text") -> DataFrame:
    """Distinct token n-grams of the benchmark corpus: one column
    ``gram``. Small by construction — meant to be broadcast."""
    from hickoryspark.ops.dedup import shingles

    return (
        benchmark.select(
            F.explode(
                F.array_distinct(shingles(F.col(text_col), n))
            ).alias("gram")
        )
        .distinct()
    )


def ngram_overlap(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                  text_col: str = "text") -> DataFrame:
    """Per-document benchmark contamination counts: ``(doc_id,
    n_hits)`` for EVERY input document (zero-filled); ``n_hits``
    counts the DISTINCT n-grams of the doc appearing anywhere in the
    benchmark corpus.

    Scale shape: the benchmark gram set broadcasts; per-doc gram
    dedup is row-local array_distinct (no distinct-shuffle); the
    broadcast join is left_semi so non-matching grams die map-side;
    the only exchange is the map-side-combined (doc_id, count)
    rollup."""
    bench = benchmark_ngrams(benchmark, n, text_col)
    from hickoryspark.ops.dedup import shingles

    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles(F.col(text_col), n))
        ).alias("gram"),
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
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
            .alias("n_hits"),
        )
    )


def canary_hits(docs: DataFrame, canaries: list,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Benchmark canary-string scan — the complement of n-gram
    decontamination: eval suites embed a GLOBALLY UNIQUE canary GUID
    (the BIG-bench convention) precisely so corpus builders can drop
    any document carrying it. One row per (doc, canary) HIT:
    ``(doc_id, canary_idx, n_occurrences)`` with the 0-based index
    into ``canaries`` and the non-overlapping occurrence count (the
    textstats._substr_count length-difference rule).

    Scale shape: the canary list is a plan-time constant folded into
    one projected array of (idx, count) structs — no join, no
    shuffle, one scan; rows exist only for hits so the output is
    near-empty on a clean corpus."""
    _validate_canaries(canaries)
    t = F.col(text_col)
    entries = F.array(*[
        F.struct(
            F.lit(i).cast("long").alias("canary_idx"),
            ((F.length(t) - F.length(F.replace(t, F.lit(c), F.lit(""))))
             / len(c)).cast("long").alias("n_occurrences"),
        )
        for i, c in enumerate(canaries)
    ])
    hit = F.filter(entries, lambda e: e["n_occurrences"] > 0)
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(hit).alias("_h")
    ).select(
        "doc_id",
        F.col("_h.canary_idx").alias("canary_idx"),
        F.col("_h.n_occurrences").alias("n_occurrences"),
    )


def _validate_canaries(canaries: list) -> None:
    """Non-empty list of non-empty strings — an empty canary would
    divide by zero: NULL (a silently-vanished hit) on the Spark side,
    an error in the DuckDB mirror. Reject it at entry on BOTH."""
    if not canaries:
        raise ValueError("canaries must be a non-empty list")
    if any(not c for c in canaries):
        raise ValueError("canary strings must be non-empty")


def duckdb_canary_sql(docs_rel: str, canaries: list,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """Full DuckDB mirror of :func:`canary_hits` (canaries must not
    contain single quotes)."""
    _validate_canaries(canaries)
    parts = []
    for i, c in enumerate(canaries):
        cnt = (f"(length({text_col}) - length(replace({text_col},"
               f" '{c}', ''))) // {len(c)}")
        parts.append(
            f"SELECT {id_col} AS doc_id,"
            f" CAST({i} AS BIGINT) AS canary_idx,"
            f" CAST({cnt} AS BIGINT) AS n_occurrences"
            f" FROM {docs_rel} WHERE {cnt} > 0")
    return " UNION ALL ".join(parts)
