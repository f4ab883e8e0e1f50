"""Token-window chunking — split long documents into overlapping
windows for embedding / context-length-bounded training.

The complement to ops/sampling.py's ``pack_sequences`` (which packs
SHORT docs up to a budget): chunking cuts LONG docs down, with overlap
so no span loses its context at a boundary. Standard retrieval/
embedding preprocessing.

Pinned semantics (so the DuckDB oracle can reproduce them):

- TOKENS are the ASCII-whitespace-split words of ``text`` with empty
  strings removed (the Java ``\\s`` class ``[ \\t\\n\\x0b\\f\\r]`` —
  shared verbatim with the RE2 mirror; Python's Unicode ``\\s`` would
  diverge, see CLAUDE.md);
- ``stride = max_tokens - overlap`` (``overlap`` must be smaller than
  ``max_tokens``); chunk ``i`` is ``tokens[i*stride : i*stride +
  max_tokens]``;
- ``n_chunks = max(1, ceil((n_tokens - overlap) / stride))`` — one
  chunk when the doc fits, and the last chunk always reaches the final
  token; a doc with ZERO tokens yields zero rows;
- ``chunk_text`` is the single-space join of the window's tokens
  (normalized, not a substring of the original).

Scale shape: shuffle-free — one projection computes the token array
and chunk count, one generator explode emits the windows; every row's
work is bounded by its own document length. All JVM-side (split /
filter / sequence / slice / array_join)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.metadata import ASCII_WS_RE

__all__ = ["chunk_tokens", "ASCII_WS_SPLIT_RE"]

#: ASCII whitespace run — Java \s semantics, valid RE2. Single-sourced
#: from ops.metadata (the repo-wide pinned class); re-exported under
#: the historical name for ops.terms and callers.
ASCII_WS_SPLIT_RE = ASCII_WS_RE


def chunk_tokens(docs: DataFrame, max_tokens: int = 512,
                 overlap: int = 64, text_col: str = "text") -> DataFrame:
    """``(doc_id, chunk_id, n_chunks, chunk_text, n_chunk_tokens)`` —
    one row per overlapping token window."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), ASCII_WS_SPLIT_RE),
        lambda t: t != "",
    )
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
    ).select(
        "doc_id",
        "toks",
        F.greatest(
            F.lit(1),
            F.ceil((F.size("toks") - F.lit(overlap)) / F.lit(stride)),
        ).cast("int").alias("n_chunks"),
    ).where(F.size("toks") > 0)
    # sequence(0, n_chunks-1) is safe: n_chunks >= 1 here, so the
    # bound never drops below the start (Spark would yield a
    # DESCENDING range — the CLAUDE.md sequence() guard)
    return base.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
            "_p", "chunk_id"
        ),
        "n_chunks",
        "toks",
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "n_chunks",
        F.array_join(
            F.slice(F.col("toks"), F.col("chunk_id") * stride + 1,
                    max_tokens),
            " ",
        ).alias("chunk_text"),
        F.least(
            F.lit(max_tokens),
            F.size("toks") - F.col("chunk_id") * stride,
        ).cast("int").alias("n_chunk_tokens"),
    )
