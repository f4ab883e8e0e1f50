"""Emoji / pictograph audit — register + platform-text signal.

Web-text curation reads emoji density as a register signal (chat/
social-media text vs formal prose), and ML tokenizer audits need
astral-plane and ZWJ-sequence counts (emoji are the dominant
supplementary-plane content in web corpora; ZWJ sequences are the
classic "one glyph, many tokens" fertility trap). Complements
ops/scripts.py (per-script histograms — emoji are scriptless
``So``/``Sk`` symbols that no script class counts) and
ops/invischars.py (whose ZWJ count is payload-agnostic; here the
joiner is counted only when it actually joins emoji).

Pinned classes (shared verbatim with the DuckDB mirror; Java-regex ∩
RE2 subset, ``\\x{...}`` escapes so no astral byte lives in source):

- ``EMOJI_RE``: the six dedicated pictograph blocks — Misc Symbols
  U+2600–U+26FF, Dingbats U+2700–U+27BF, Misc Symbols & Pictographs
  U+1F300–U+1F5FF, Emoticons U+1F600–U+1F64F, Transport U+1F680–
  U+1F6FF, Supplemental Symbols U+1F900–U+1F9FF, Symbols Extended-A
  U+1FA70–U+1FAFF. (Deliberately NOT variation selectors or keycap
  digits — base-plane characters with emoji *presentation* are a
  rendering property, not content.)
- ``FLAG_RE``: regional indicators U+1F1E6–U+1F1FF, counted as code
  POINTS (a flag is a pair; ``n_flag_points`` is even for well-formed
  flag runs — odd counts betray truncation).
- ``ZWJ_JOIN_RE``: U+200D immediately followed by an emoji-class
  character — each join edge of a ZWJ sequence. A chain of k joins
  yields k matches (each match consumes joiner + next emoji, so scan
  resumes exactly at the following joiner; no lookahead — RE2 has
  none).

``emoji_ppm`` = 1e6 * n_emoji div n_chars (NULL on empty text);
``has_emoji`` flags any emoji or flag point. Pure JVM column
expressions, shuffle-free; NULL text rows are dropped (the per-doc
audit convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "emoji_audit",
    "duckdb_emoji_sql",
    "EMOJI_RE",
    "FLAG_RE",
    "ZWJ_JOIN_RE",
]

_EMOJI_CLASS = ("\\x{2600}-\\x{27BF}"
                "\\x{1F300}-\\x{1F5FF}"
                "\\x{1F600}-\\x{1F64F}"
                "\\x{1F680}-\\x{1F6FF}"
                "\\x{1F900}-\\x{1F9FF}"
                "\\x{1FA70}-\\x{1FAFF}")

#: shared verbatim between Spark (Java regex) and DuckDB (RE2)
EMOJI_RE = f"[{_EMOJI_CLASS}]"
FLAG_RE = "[\\x{1F1E6}-\\x{1F1FF}]"
ZWJ_JOIN_RE = f"\\x{{200D}}[{_EMOJI_CLASS}]"


def emoji_audit(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, n_chars, n_emoji, n_flag_points, n_zwj_joins,
    emoji_ppm, has_emoji)`` per non-NULL text row."""
    t = F.col(text_col)
    counted = docs.where(t.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.length(t).cast("long").alias("n_chars"),
        F.regexp_count(t, F.lit(EMOJI_RE)).cast("long").alias("n_emoji"),
        F.regexp_count(t, F.lit(FLAG_RE)).cast("long")
        .alias("n_flag_points"),
        F.regexp_count(t, F.lit(ZWJ_JOIN_RE)).cast("long")
        .alias("n_zwj_joins"),
    )
    return counted.select(
        "doc_id", "n_chars", "n_emoji", "n_flag_points", "n_zwj_joins",
        F.when(F.col("n_chars") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr("1000000 * n_emoji div n_chars"))
        .alias("emoji_ppm"),
        ((F.col("n_emoji") > 0) | (F.col("n_flag_points") > 0))
        .cast("long").alias("has_emoji"),
    )


def duckdb_emoji_sql(docs_rel: str, text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    """Full DuckDB mirror; ``docs_rel`` must expose (id, text)."""
    def cnt(pat: str) -> str:
        return (f"CAST(len(regexp_extract_all({text_col}, "
                f"'{pat}')) AS BIGINT)")

    return f"""
        WITH counted AS (
          SELECT {id_col} AS doc_id,
                 CAST(length({text_col}) AS BIGINT) AS n_chars,
                 {cnt(EMOJI_RE)} AS n_emoji,
                 {cnt(FLAG_RE)} AS n_flag_points,
                 {cnt(ZWJ_JOIN_RE)} AS n_zwj_joins
          FROM {docs_rel} WHERE {text_col} IS NOT NULL)
        SELECT doc_id, n_chars, n_emoji, n_flag_points, n_zwj_joins,
               CASE WHEN n_chars = 0 THEN NULL
                    ELSE 1000000 * n_emoji // n_chars
               END AS emoji_ppm,
               CAST(CASE WHEN n_emoji > 0 OR n_flag_points > 0
                         THEN 1 ELSE 0 END AS BIGINT) AS has_emoji
        FROM counted"""
