"""Document integrity flags — truncation and imbalance signals.

Scraped/extracted text is often CUT: mid-sentence tail truncation
(extractor byte limits), head truncation (pagination), or markup
damage leaving unbalanced brackets/quotes. Gopher's rule A1.5 keys on
terminal punctuation; this operator emits the full flag set corpora
filter and audit on.

Pinned exact-integer semantics (oracle-reproducible):

- ``ends_terminal``: the ASCII-rtrimmed text's last char is one of
  ``. ! ? "`` (the Gopher terminal set) — 1/0, 0 for empty;
- ``ends_ellipsis``: the rtrimmed text ends with ``...`` or U+2026 —
  the "read more" truncation tell;
- ``starts_lower``: the ASCII-ltrimmed text starts with ``[a-z]`` —
  the head-truncation tell;
- ``paren_delta`` = count('(') - count(')') (signed BIGINT);
- ``quote_odd``: count('"') is odd — 1/0.

Shuffle-free, pure JVM column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["text_integrity", "duckdb_integrity_sql"]

_WS = " \\t\\n\\r"


def _count(col, ch):
    return (F.length(col) - F.length(F.replace(col, F.lit(ch)))) \
        .cast("long")


def text_integrity(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, ends_terminal, ends_ellipsis, starts_lower,
    paren_delta, quote_odd)`` — one row per doc."""
    t = F.col(text_col)
    rt = F.expr(f"trim(TRAILING ' {_WS[1:]}' FROM {text_col})")
    lt = F.expr(f"trim(LEADING ' {_WS[1:]}' FROM {text_col})")
    last = F.substring(rt, -1, 1)
    return docs.select(
        F.col(id_col),
        last.isin(".", "!", "?", '"').cast("long")
        .alias("ends_terminal"),
        (rt.endswith("...") | rt.endswith("…")).cast("long")
        .alias("ends_ellipsis"),
        F.substring(lt, 1, 1).rlike("^[a-z]$").cast("long")
        .alias("starts_lower"),
        (_count(t, "(") - _count(t, ")")).alias("paren_delta"),
        (_count(t, '"') % 2).cast("long").alias("quote_odd"),
    )


def duckdb_integrity_sql(docs_rel: str) -> str:
    """Full DuckDB mirror — same trim sets, same counts."""
    ws = "' ' || chr(9) || chr(10) || chr(13)"
    cnt = ("(length(text) - length(replace(text, '{c}', '')))")
    return f"""
        WITH t AS (
          SELECT doc_id, text,
                 rtrim(text, {ws}) AS rt,
                 ltrim(text, {ws}) AS lt
          FROM {docs_rel})
        SELECT doc_id,
               CAST(CASE WHEN rt[-1:] IN ('.', '!', '?', '"')
                    THEN 1 ELSE 0 END AS BIGINT) AS ends_terminal,
               CAST(CASE WHEN ends_with(rt, '...')
                           OR ends_with(rt, chr(8230))
                    THEN 1 ELSE 0 END AS BIGINT) AS ends_ellipsis,
               CAST(CASE WHEN regexp_matches(lt[1:1], '^[a-z]$')
                    THEN 1 ELSE 0 END AS BIGINT) AS starts_lower,
               CAST({cnt.format(c='(')} - {cnt.format(c=')')}
                    AS BIGINT) AS paren_delta,
               CAST({cnt.format(c='"')} % 2 AS BIGINT) AS quote_odd
        FROM t"""
