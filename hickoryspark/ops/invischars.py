"""Invisible / bidi-control character audit.

LLM corpus screens flag documents carrying invisible Unicode:
zero-width characters hide payloads and split tokens, bidi control
characters reorder displayed text against its logical order (the
"Trojan Source" attack, Boucher & Anderson 2021), and stray soft
hyphens fragment words. All three are near-absent from honest prose,
so counts make a cheap poisoning/cloaking signal.

Pinned semantics (full mirror — the regexes are shared verbatim with
the DuckDB oracle, written in the Java-regex ∩ RE2 subset with
``\\x{...}`` escapes so no raw invisible byte lives in source):

- ``n_zero_width``: U+200B ZWSP, U+200C ZWNJ, U+200D ZWJ, U+2060
  word joiner, U+FEFF (ZWNBSP — a BOM *inside* text is content);
- ``n_bidi``: U+061C ALM, U+200E/U+200F LRM/RLM, U+202A–U+202E
  embedding/override controls, U+2066–U+2069 isolate controls;
- ``n_soft_hyphen``: U+00AD;
- ``n_chars``: code-point length (both engines' ``length``);
- ``invis_ppm`` = 1e6 * (zw + bidi + shy) div n_chars, NULL when the
  text is empty; ``has_bidi`` = 1 iff any bidi control (the
  Trojan-Source flag — ANY occurrence is suspect, density is not).

Scale shape: pure JVM column expressions, shuffle-free; NULL text
rows are dropped (the mapInPandas-parser convention, kept here for
schema parity with the other per-doc audits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "invisible_char_audit",
    "duckdb_invischars_sql",
    "ZW_RE",
    "BIDI_RE",
    "SHY_RE",
]

#: shared verbatim between Spark (Java regex) and DuckDB (RE2)
ZW_RE = "[\\x{200B}\\x{200C}\\x{200D}\\x{2060}\\x{FEFF}]"
BIDI_RE = ("[\\x{061C}\\x{200E}\\x{200F}"
           "\\x{202A}-\\x{202E}\\x{2066}-\\x{2069}]")
SHY_RE = "\\x{00AD}"


def invisible_char_audit(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, n_chars, n_zero_width, n_bidi, n_soft_hyphen,
    invis_ppm, has_bidi)`` per non-NULL text row."""
    t = F.col(text_col)
    counted = docs.where(t.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.length(t).cast("long").alias("n_chars"),
        F.regexp_count(t, F.lit(ZW_RE)).cast("long")
        .alias("n_zero_width"),
        F.regexp_count(t, F.lit(BIDI_RE)).cast("long").alias("n_bidi"),
        F.regexp_count(t, F.lit(SHY_RE)).cast("long")
        .alias("n_soft_hyphen"),
    )
    return counted.select(
        "doc_id", "n_chars", "n_zero_width", "n_bidi", "n_soft_hyphen",
        F.when(F.col("n_chars") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr(
            "1000000 * (n_zero_width + n_bidi + n_soft_hyphen)"
            " div n_chars")).alias("invis_ppm"),
        (F.col("n_bidi") > 0).cast("long").alias("has_bidi"),
    )


def duckdb_invischars_sql(docs_rel: str, text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """Full DuckDB mirror; ``docs_rel`` must expose (id, text)."""
    def cnt(pat: str) -> str:
        return (f"CAST(len(regexp_extract_all({text_col}, "
                f"'{pat}')) AS BIGINT)")

    return f"""
        WITH counted AS (
          SELECT {id_col} AS doc_id,
                 CAST(length({text_col}) AS BIGINT) AS n_chars,
                 {cnt(ZW_RE)} AS n_zero_width,
                 {cnt(BIDI_RE)} AS n_bidi,
                 {cnt(SHY_RE)} AS n_soft_hyphen
          FROM {docs_rel} WHERE {text_col} IS NOT NULL)
        SELECT doc_id, n_chars, n_zero_width, n_bidi, n_soft_hyphen,
               CASE WHEN n_chars = 0 THEN NULL
                    ELSE 1000000 * (n_zero_width + n_bidi
                                    + n_soft_hyphen) // n_chars
               END AS invis_ppm,
               CAST(CASE WHEN n_bidi > 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS has_bidi
        FROM counted"""
