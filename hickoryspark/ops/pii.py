"""PII detection / redaction over text columns: emails, IPv4
addresses, phone numbers.

The standard web-corpus scrubbing pass (C4/refined-web style): match
conservative ASCII patterns and replace with typed placeholder tokens.
Everything is ``regexp_replace`` / ``regexp_extract_all`` column
expressions — whole-stage codegen, zero Python, no shuffle — with an
exact DuckDB mirror (``duckdb_redact_sql`` / ``duckdb_count_sql``) for
the correctness oracle.

Dialect rules (the ops/urls.py lesson): every pattern must mean the
same thing to Java regex (Spark) and RE2 (DuckDB) — explicit ``[0-9]``
classes, no ``$`` / ``.``-tails, no backreferences; ``\\b`` is the
ASCII word boundary in both. Alternation is avoided entirely (the two
phone shapes are two sequential rules) so leftmost-first vs
leftmost-longest can never diverge. Rules apply IN ORDER — emails
first so an address's numeric fragments can't half-match as a phone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_RULES", "redact_pii_col", "redact_pii", "pii_counts",
    "pii_report", "duckdb_redact_sql", "duckdb_count_sql",
    "DEOBFUSCATE_RULES", "deobfuscate_col", "deobfuscated_emails",
    "duckdb_deobfuscated_sql",
]

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
#: international numbers, separated ("+12 345 6789") then compact
#: ("+123456789") — two rules, not one alternation (see module doc)
_PHONE_SEP = r"\+[0-9]{1,3}(?:[ -][0-9]{2,5}){2,5}"
_PHONE_COMPACT = r"\+[0-9]{7,15}"

#: (kind, pattern, replacement) applied in order
PII_RULES: list[tuple[str, str, str]] = [
    ("email", _EMAIL, "<EMAIL>"),
    ("ip", _IPV4, "<IP>"),
    ("phone", _PHONE_SEP, "<PHONE>"),
    ("phone", _PHONE_COMPACT, "<PHONE>"),
]


def redact_pii_col(col: Column) -> Column:
    """The redaction chain as a single Column expression."""
    for _, pat, repl in PII_RULES:
        col = F.regexp_replace(col, pat, repl)
    return col


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """All input columns plus ``out_col`` with PII placeholders."""
    return df.withColumn(out_col, redact_pii_col(F.col(text_col)))


def _count_cols(col: Column) -> dict[str, Column]:
    """Match counts per kind following the EXACT redaction order: each
    rule counts on the text with all earlier rules already applied, so
    ``n_<kind>`` always equals the number of ``<KIND>`` placeholders in
    ``redact_pii_col``'s output (an IP inside an already-redacted email
    is not an IP; a phone fragment swallowed by an email is not a
    phone)."""
    counts: dict[str, Column] = {}
    for kind, pat, repl in PII_RULES:
        n = F.size(F.regexp_extract_all(col, F.lit(pat), 0))
        key = f"n_{kind}"
        counts[key] = counts[key] + n if key in counts else n
        col = F.regexp_replace(col, pat, repl)
    return counts


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ip, n_phone)."""
    cols = _count_cols(F.col(text_col))
    return df.select(
        "doc_id", *(c.cast("long").alias(k) for k, c in cols.items())
    )


def pii_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ip, n_phone, text_redacted) — counts and
    redaction in ONE projection over the scan (no join, no second
    pass)."""
    col = F.col(text_col)
    cols = _count_cols(col)
    return df.select(
        "doc_id",
        *(c.cast("long").alias(k) for k, c in cols.items()),
        redact_pii_col(col).alias("text_redacted"),
    )


def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


def duckdb_redact_sql(expr: str) -> str:
    """DuckDB expression mirroring ``redact_pii_col`` over ``expr``
    (RE2 + 'g' flag; Spark's regexp_replace is global by default)."""
    for _, pat, repl in PII_RULES:
        expr = f"regexp_replace({expr}, {_sql_quote(pat)}, '{repl}', 'g')"
    return expr


def duckdb_count_sql(expr: str) -> dict[str, str]:
    """DuckDB expressions mirroring ``pii_counts`` over ``expr`` (same
    progressive-redaction counting order)."""
    counts: dict[str, str] = {}
    for kind, pat, repl in PII_RULES:
        n = f"len(regexp_extract_all({expr}, {_sql_quote(pat)}))"
        key = f"n_{kind}"
        counts[key] = f"{counts[key]} + {n}" if key in counts else n
        expr = f"regexp_replace({expr}, {_sql_quote(pat)}, '{repl}', 'g')"
    return counts


# ------------------------------------------------------- deobfuscation

#: ' [at] ' / '(at)' / '{at}' -> '@'; same bracket family for dot.
#: Explicit ASCII case classes (the soft404 rule: never (?i));
#: optional SINGLE surrounding spaces; open/close brackets are not
#: pair-matched ('[at)' folds too — obfuscators are not consistent,
#: documented). Java ∩ RE2: no $, no lookaround, no backrefs.
DEOBFUSCATE_RULES = [
    (" ?[\\[({][aA][tT][\\])}] ?", "@"),
    (" ?[\\[({][dD][oO][tT][\\])}] ?", "."),
]


def deobfuscate_col(col: Column) -> Column:
    """Bracket-obfuscated address syntax folded back to ``@`` / ``.``
    (rules applied in order, each a global non-overlapping pass)."""
    out = col
    for pat, repl in DEOBFUSCATE_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def deobfuscated_emails(docs: DataFrame,
                        text_col: str = "text") -> DataFrame:
    """docs(doc_id, <text_col>, ...) ->
    ``(doc_id, n_plain, n_deobfuscated, n_hidden)`` — email counts in
    the raw text, in the deobfuscated text, and the delta (addresses
    the bracket folding revealed). The PII-audit companion: a corpus
    that scrubs only plain addresses ships ``n_hidden`` leaks.

    Shuffle-free column expressions; mirror =
    ``duckdb_deobfuscated_sql``."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    deob = deobfuscate_col(raw)
    n_plain = F.size(F.regexp_extract_all(raw, F.lit(_EMAIL), F.lit(0)))
    n_deob = F.size(F.regexp_extract_all(deob, F.lit(_EMAIL), F.lit(0)))
    return docs.select(
        "doc_id",
        n_plain.cast("long").alias("n_plain"),
        n_deob.cast("long").alias("n_deobfuscated"),
        (n_deob - n_plain).cast("long").alias("n_hidden"),
    )


def duckdb_deobfuscated_sql(rel: str, text_expr: str = "text") -> str:
    """Full DuckDB mirror of :func:`deobfuscated_emails`."""
    raw = f"COALESCE({text_expr}, '')"
    deob = raw
    for pat, repl in DEOBFUSCATE_RULES:
        deob = (f"regexp_replace({deob}, {_sql_quote(pat)}, "
                f"'{repl}', 'g')")
    em = _sql_quote(_EMAIL)
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all({raw}, {em})) AS BIGINT)
                 AS n_plain,
               CAST(len(regexp_extract_all({deob}, {em})) AS BIGINT)
                 AS n_deobfuscated,
               CAST(len(regexp_extract_all({deob}, {em}))
                 - len(regexp_extract_all({raw}, {em})) AS BIGINT)
                 AS n_hidden
        FROM {rel}"""
