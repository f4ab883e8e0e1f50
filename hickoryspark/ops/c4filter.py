"""C4-style line and page filtering (Raffel et al. 2020, the
"Colossal Clean Crawled Corpus" cleaning recipe, §2.2) — the most
widely replicated web-text curation rule set.

Pinned subset (the deterministic, single-doc rules; the corpus-level
pieces ship separately: three-sentence-span dedup = ops/spans.py,
bad-word page removal = ops/wordfilter.py):

line rules — a line is KEPT iff all of:
- its ASCII-space/tab-rstripped form ends in a terminal punctuation
  mark (``.``, ``!``, ``?``, ``"``);
- it has at least 5 ASCII-whitespace words;
- it does not contain ``javascript`` case-insensitively (the C4
  reference implementation's substring test);

page rules — after line filtering, the page is DROPPED with the
FIRST matching reason:
- ``lorem_ipsum``: the ORIGINAL text contains ``lorem ipsum``
  case-insensitively;
- ``brace``: the ORIGINAL text contains ``{`` (code page);
- ``few_sentences``: the kept text has fewer than 3 sentences, where
  a sentence boundary is an occurrence of ``.``/``!``/``?`` in the
  kept text (a pinned simplification of C4's splitter — stated here
  so the oracle can reproduce it exactly).

Pinned I/O: a "line" is a ``\\n`` split segment (CRLF inputs go
through ops.textnorm first — the dedup_lines rule); NULL text behaves
as ``''``; every input doc keeps its output row (``keep_doc`` tells
the caller what to drop — filtering is their one-line ``where``).

Scale shape: ZERO shuffles — the whole program is per-row
higher-order array expressions (split → filter → array_join), no
explode, no Python. Contrast ops/lines.dedup_lines (corpus-level
document frequencies, two shuffles); this is the per-doc half of the
recipe. The DuckDB mirror is GENERATED from the same patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["c4_line_filter", "duckdb_c4_sql", "TERMINAL_RE",
           "MIN_WORDS", "MIN_SENTENCES"]

#: rstripped line must END in one of these (\z, never $ — the
#: cross-dialect rule)
TERMINAL_RE = '[.!?"]\\z'

#: sentence-boundary characters counted in the kept text
_SENT_SPLIT_RE = "[.!?]"

MIN_WORDS = 5
MIN_SENTENCES = 3


def _keep_line(line: Column) -> Column:
    rstripped = F.regexp_replace(line, "[ \\t]+\\z", "")
    n_words = F.size(F.filter(
        F.split(line, ASCII_WS_SPLIT_RE), lambda t: t != ""))
    return (
        rstripped.rlike(TERMINAL_RE)
        & (n_words >= MIN_WORDS)
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_line_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, text, ...) → (doc_id, text, n_lines_kept,
    n_lines_removed, n_sentences, keep_doc, drop_reason) under the
    pinned C4 rules; ``text`` is the kept lines re-joined with
    ``\\n``."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(raw, "\n")
    kept_arr = F.filter(lines, _keep_line)
    kept = F.array_join(kept_arr, "\n")
    n_kept = F.size(kept_arr).cast("long")
    n_removed = (F.size(lines) - F.size(kept_arr)).cast("long")
    n_sentences = (F.size(F.split(kept, _SENT_SPLIT_RE)) - 1).cast("long")
    low = F.lower(raw)
    reason = (
        F.when(F.contains(low, F.lit("lorem ipsum")), F.lit("lorem_ipsum"))
        .when(F.contains(raw, F.lit("{")), F.lit("brace"))
        .when(n_sentences < MIN_SENTENCES, F.lit("few_sentences"))
        .otherwise(F.lit(""))
    )
    return docs.select(
        "doc_id",
        kept.alias("text"),
        n_kept.alias("n_lines_kept"),
        n_removed.alias("n_lines_removed"),
        n_sentences.alias("n_sentences"),
        (reason == "").alias("keep_doc"),
        reason.alias("drop_reason"),
    )


def duckdb_c4_sql(docs_rel: str, text: str = "text") -> str:
    """Full DuckDB mirror of :func:`c4_line_filter` over relation
    ``docs_rel`` (must expose doc_id and ``text``)."""
    raw = f"COALESCE({text}, '')"
    keep = (
        "regexp_matches(regexp_replace(l, '[ \\t]+\\z', ''), "
        f"'{TERMINAL_RE}') AND len(list_filter(regexp_split_to_array("
        f"l, '{ASCII_WS_SPLIT_RE}'), s -> s != '')) >= {MIN_WORDS} "
        "AND NOT contains(lower(l), 'javascript')"
    )
    return f"""
        WITH c4 AS (
          SELECT doc_id, {raw} AS raw,
                 string_split({raw}, chr(10)) AS lines,
                 list_filter(string_split({raw}, chr(10)),
                             l -> {keep}) AS kept_arr
          FROM {docs_rel}
        ), j AS (
          -- DuckDB array_to_string([]) is NULL where Spark
          -- array_join([]) is '' — COALESCE pins the Spark behavior
          SELECT doc_id, raw, lines, kept_arr,
                 COALESCE(array_to_string(kept_arr, chr(10)), '')
                     AS kept,
                 CAST(len(regexp_split_to_array(
                   COALESCE(array_to_string(kept_arr, chr(10)), ''),
                   '{_SENT_SPLIT_RE}')) - 1 AS BIGINT) AS n_sentences
          FROM c4
        )
        SELECT doc_id, kept AS text,
               CAST(len(kept_arr) AS BIGINT) AS n_lines_kept,
               CAST(len(lines) - len(kept_arr) AS BIGINT)
                   AS n_lines_removed,
               n_sentences,
               (CASE WHEN contains(lower(raw), 'lorem ipsum')
                       THEN 'lorem_ipsum'
                     WHEN contains(raw, '{{') THEN 'brace'
                     WHEN n_sentences < {MIN_SENTENCES}
                       THEN 'few_sentences'
                     ELSE '' END) = '' AS keep_doc,
               CASE WHEN contains(lower(raw), 'lorem ipsum')
                      THEN 'lorem_ipsum'
                    WHEN contains(raw, '{{') THEN 'brace'
                    WHEN n_sentences < {MIN_SENTENCES}
                      THEN 'few_sentences'
                    ELSE '' END AS drop_reason
        FROM j"""
