"""Unicode script-range histograms — the language-mix signal.

Language-ID models (and the trigram/stopword detectors in
ops/textstats.py) assume a dominant script; multilingual-corpus
curation first SPLITS by script (CC-100 / mC4 both bucket documents
by script before per-language filtering), and mixed-script pages are
a spam signal (Cyrillic homoglyph stuffing inside Latin text). This
op profiles each document's characters against a PINNED set of BMP
script ranges and reports integer parts-per-million per script, the
mojibake_stats shape: exact ``div`` arithmetic, no floats, one
regexp_count per class, no shuffle.

Pinned classes (``SCRIPT_CLASSES`` — name -> regex char class):
BMP ranges only (both engines count astral chars engine-specifically;
the profile deliberately ignores them), ASCII letters fold into
``latin``, combining marks fold into their block's script. ppm
denominators are TOTAL characters (not letters), so whitespace and
punctuation dilute every script — ratios compare across docs with
the same semantics.

Scale: pure JVM column expressions (whole-stage codegen, one pass per
class over the text), shuffle-free; the mirror is GENERATED from the
same class table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SCRIPT_CLASSES", "script_profile", "duckdb_script_sql"]

#: name -> single-char regex class, Java-regex ∩ RE2 (\\x{...} works
#: in both); BMP only, ordered = output column order
SCRIPT_CLASSES: dict[str, str] = {
    "latin": r"[A-Za-z\x{00C0}-\x{024F}]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "greek": r"[\x{0370}-\x{03FF}]",
    "arabic": r"[\x{0600}-\x{06FF}\x{0750}-\x{077F}]",
    "hebrew": r"[\x{0590}-\x{05FF}]",
    "devanagari": r"[\x{0900}-\x{097F}]",
    "cjk": r"[\x{2E80}-\x{9FFF}\x{F900}-\x{FAFF}]",
    "kana": r"[\x{3040}-\x{30FF}]",
    "hangul": r"[\x{1100}-\x{11FF}\x{AC00}-\x{D7A3}]",
    "digit": r"[0-9]",
}


def script_profile(docs: DataFrame, text_col: str = "text",
                   id_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """(id_cols..., n_chars, <script>_ppm per class) — integer ppm of
    each script class over total characters; 0 for empty docs; NULL
    text profiles as an all-NULL row (the caller's failed-decode
    marker must stay visible, never fold to 0)."""
    text = F.col(text_col)
    counted = docs.select(
        *id_cols,
        F.length(text).cast("long").alias("n_chars"),
        *[F.regexp_count(text, F.lit(cls)).cast("long")
          .alias(f"_c_{name}") for name, cls in SCRIPT_CLASSES.items()],
    )
    out = counted.withColumns({
        f"{name}_ppm": F.when(F.col("n_chars").isNull(),
                              F.lit(None).cast("long"))
        .when(F.col("n_chars") > 0,
              F.expr(f"(1000000 * _c_{name}) div n_chars"))
        .otherwise(F.lit(0)).cast("long")
        for name in SCRIPT_CLASSES
    })
    return out.drop(*[f"_c_{name}" for name in SCRIPT_CLASSES])


def duckdb_script_sql(text_expr: str) -> str:
    """DuckDB SELECT-list fragment mirroring :func:`script_profile`
    (same classes, len(regexp_extract_all) counting)."""
    def q(p: str) -> str:
        return "'" + p.replace("'", "''") + "'"

    cols = [f"CAST(length({text_expr}) AS BIGINT) AS n_chars"]
    for name, cls in SCRIPT_CLASSES.items():
        cnt = f"len(regexp_extract_all({text_expr}, {q(cls)}))"
        cols.append(
            f"CAST(CASE WHEN {text_expr} IS NULL THEN NULL "
            f"WHEN length({text_expr}) > 0 "
            f"THEN (1000000 * {cnt}) // length({text_expr}) "
            f"ELSE 0 END AS BIGINT) AS {name}_ppm"
        )
    return ", ".join(cols)
