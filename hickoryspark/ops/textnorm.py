"""Unicode text normalization — the canonicalization stage a training
pipeline runs between extraction and dedup (inconsistent composed /
decomposed forms, stray control bytes, and ragged whitespace make
near-identical documents hash apart and pollute token statistics).

Three deterministic steps, in this exact order (the DuckDB oracle
mirrors it operator for operator):

1. Unicode NFC normalization (canonical composition — 'e' + U+0301
   becomes 'é'; NFC, not NFKC: compatibility forms like ligatures are
   meaningful content and stay).
2. C0/C1 control stripping (except the ASCII whitespace controls
   handled by step 3): [\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]
   removed.
3. ASCII whitespace collapse + trim: runs of [ \\t\\n\\r\\f\\x0B]
   become one space, leading/trailing spaces drop. Deliberately ASCII
   (both engines' \\s differ on Unicode spaces; U+00A0 etc. are
   CONTENT here — fold them earlier in the pipeline if unwanted).

Runs in one mapInPandas pass (Arrow-batched transfer; no shuffle — one
output row per input row), mapping the single scalar implementation
over each batch.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame

_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
_WS_RE = re.compile("[ \t\n\r\f\x0b]+")


def normalize_string(s: str) -> str:
    """The three-step normalization — the SINGLE implementation; the
    Spark path maps it over each Arrow batch (string ops in pandas are
    per-element Python either way, so a .str chain would only
    duplicate the logic, not vectorize it)."""
    import unicodedata

    s = unicodedata.normalize("NFC", s)
    s = _CTRL_RE.sub("", s)
    return _WS_RE.sub(" ", s).strip(" ")


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, <text_col>, ...) -> (doc_id, norm_text, changed).

    ``changed`` flags rows the normalization altered — the cheap
    monitor counter for how dirty an incoming crawl slice is."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if not len(b):
                continue
            src = b[text_col].fillna("")
            norm = src.map(normalize_string)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "norm_text": norm,
                    "changed": (norm != src),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "doc_id long, norm_text string, changed boolean"
    )


# ---- mojibake detection -------------------------------------------------
#
# Pinned heuristic signatures (shared verbatim with the DuckDB mirror;
# Java regex \u2229 RE2 -- explicit BMP char classes, no anchors):
# - U+FFFD replacement chars (a decoder already gave up);
# - UTF-8-as-latin1 double decoding: U+00C2/U+00C3 followed by a char
#   in U+0080-U+00FF (the C2/C3 lead-byte signature), plus the
#   U+00E2 U+20AC pair ("\u00e2\u20ac" -- E2 80 read as cp1252, the
#   curly-quote family);
# - bare C1 controls U+0080-U+009F (cp1252 bytes decoded as latin1).
MOJIBAKE_PATTERNS = {
    "n_fffd": "\ufffd",
    "n_dbl_utf8": "[\u00c2\u00c3][\u0080-\u00ff]|\u00e2\u20ac",
    "n_c1": "[\u0080-\u009f]",
}


def mojibake_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_fffd, n_dbl_utf8, n_c1, mojibake_ppm) --
    encoding-damage signals per document; ``mojibake_ppm`` is the
    integer parts-per-million of signature hits over characters
    (``div`` both engines; 0 when the doc is empty).

    Pure JVM column expressions -- whole-stage codegen, no shuffle.
    """
    from pyspark.sql import functions as F

    out = docs.select(
        "doc_id",
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        *[
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
            .alias(name)
            for name, pat in MOJIBAKE_PATTERNS.items()
        ],
    )
    return out.withColumn(
        "mojibake_ppm",
        F.when(
            F.col("n_chars") > 0,
            F.expr("(1000000 * (n_fffd + n_dbl_utf8 + n_c1))"
                   " div n_chars"),
        ).otherwise(F.lit(0)).cast("long"),
    )


def duckdb_mojibake_sql(text_expr: str) -> str:
    """DuckDB SELECT-list fragment mirroring :func:`mojibake_stats`
    (same patterns, len(regexp_extract_all) counting)."""
    def q(p: str) -> str:
        return "'" + p.replace("'", "''") + "'"

    cols = [f"CAST(length({text_expr}) AS BIGINT) AS n_chars"]
    for name, pat in MOJIBAKE_PATTERNS.items():
        cols.append(
            f"CAST(len(regexp_extract_all({text_expr}, {q(pat)})) "
            f"AS BIGINT) AS {name}"
        )
    hits = " + ".join(
        f"len(regexp_extract_all({text_expr}, {q(p)}))"
        for p in MOJIBAKE_PATTERNS.values()
    )
    cols.append(
        f"CAST(CASE WHEN length({text_expr}) > 0 THEN "
        f"(1000000 * ({hits})) // length({text_expr}) ELSE 0 END "
        f"AS BIGINT) AS mojibake_ppm"
    )
    return ", ".join(cols)


# --------------------------------------------------------------- dehyphenate

#: line-break hyphenation join: a letter, a hyphen, an optional \r, a
#: newline, then a LOWERCASE letter (uppercase after the break usually
#: means a real compound or a new sentence — the standard PDF/OCR
#: heuristic). Java-regex ∩ RE2 portable: explicit classes, no $,
#: no lookaround. ONE non-overlapping pass on both engines —
#: consecutive hyphenated breaks ("a-\nb-\nc") leave the second break
#: for a later pass by design (Java and RE2 both resume scanning after
#: the match, so the engines agree exactly).
DEHYPHEN_RE = r"([A-Za-z])-\r?\n([a-z])"


def dehyphenate_col(col: "Column") -> "Column":
    """Soft hyphens (U+00AD) removed, hyphenated line breaks joined."""
    from pyspark.sql import functions as F

    return F.regexp_replace(
        F.regexp_replace(col, "\u00ad", ""), DEHYPHEN_RE, "$1$2")


def dehyphenate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, <text_col>, ...) -> (doc_id, fixed, changed) — the
    PDF/OCR text cleanup pass (ops/pdf.py output is the natural
    input). Pure JVM column expressions, shuffle-free."""
    from pyspark.sql import functions as F

    fixed = dehyphenate_col(F.col(text_col))
    return docs.select(
        "doc_id",
        fixed.alias("fixed"),
        (fixed != F.col(text_col)).cast("long").alias("changed"),
    )


def duckdb_dehyphenate_sql(expr: str) -> str:
    """Exact DuckDB mirror of ``dehyphenate_col`` (same pattern, RE2
    backref syntax, global flag)."""
    return (
        "regexp_replace(regexp_replace(" + expr +
        ", chr(173), '', 'g'), '([A-Za-z])-\\r?\\n([a-z])', "
        "'\\1\\2', 'g')"
    )


#: compatibility-character classes counted by nfkc_stats (PYTHON
#: regex syntax — the op is Python-side only, there is no SQL
#: mirror; fullwidth/halfwidth forms block + the Latin ligature
#: block, the two classes web text actually carries)
FULLWIDTH_RE = "[\uff01-\uff60\uffe0-\uffe6]"
LIGATURE_RE = "[\ufb00-\ufb06]"


def nfkc_stats(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """NFKC compatibility audit — ``(doc_id, n_chars, nfkc_len,
    is_changed, n_fullwidth, n_ligature)``.

    Tokenizer pipelines must DECIDE on compatibility folding (NFKC
    turns fullwidth ｆｏｏ into foo and ﬁ into fi — changing both
    byte length and token boundaries); this op measures how much of
    a corpus the choice affects. ``nfkc_len`` is the code-point
    length after ``unicodedata.normalize("NFKC", text)``,
    ``is_changed`` = 1 iff the string changed, and the two class
    counts localize the most common carriers. NULL text rows are
    skipped (the mapInPandas-parser convention).

    Scale shape: one mapInPandas pass (NFKC itself has no JVM
    equivalent), shuffle-free; the class counts ride in the same
    pass for one-scan semantics.
    """
    import re as _re
    import unicodedata

    import pandas as pd

    fw = _re.compile(FULLWIDTH_RE)
    lg = _re.compile(LIGATURE_RE)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, nc, nl, ch, nf, ng = [], [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                norm = unicodedata.normalize("NFKC", text)
                ids.append(doc_id)
                nc.append(len(text))
                nl.append(len(norm))
                ch.append(1 if norm != text else 0)
                nf.append(len(fw.findall(text)))
                ng.append(len(lg.findall(text)))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_chars": pd.Series(nc, dtype="int64"),
                "nfkc_len": pd.Series(nl, dtype="int64"),
                "is_changed": pd.Series(ch, dtype="int64"),
                "n_fullwidth": pd.Series(nf, dtype="int64"),
                "n_ligature": pd.Series(ng, dtype="int64"),
            })

    return docs.select(id_col, text_col).mapInPandas(
        gen,
        "doc_id long, n_chars long, nfkc_len long, is_changed long,"
        " n_fullwidth long, n_ligature long",
    )
