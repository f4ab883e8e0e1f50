"""Word-list document filtering — the C4 "bad words" rule.

C4 (Raffel et al. 2020) dropped any page containing a word from the
"List of Dirty, Naughty, Obscene or Otherwise Bad Words"; most
web-corpus pipelines since run a variant (token-level, not
substring — 'classic' must not match a blocked 'ass'). The reference
engine has no equivalent; this extends the §2 surface the same way
ops/hosts.py does for domain lists.

Pinned semantics:

- tokens are the repo-wide ASCII-whitespace split with empties
  removed (ops/chunking.py ``ASCII_WS_SPLIT_RE``), then LOWERCASED
  and stripped of leading/trailing ASCII non-alphanumerics — a
  sentence-final ``spam.`` or ``spam,`` (the most common real-world
  position) must still match the entry ``spam``; tokens that strip
  to '' (pure punctuation) never match. Word-list entries get the
  SAME fold (lowercase, ws-trim, edge-punctuation strip; entries
  folding to '' are dropped), so a punctuated entry like ``"ass"``
  keys on its core;
- ``n_hits`` counts token OCCURRENCES that match any listed word
  (not distinct words); ``first_badword`` is the lexicographically
  smallest matched word (deterministic under any partitioning — a
  positional first would need a second pass for no curation value);
- ``passes_wordfilter`` is ``n_hits == 0``; every input doc emits a
  row (the filter composes as ``where(passes_wordfilter)``).

Scale shape: the word list is small (the C4 list is hundreds of
entries; UT1 variants low MBs) — tokens explode map-side, the word
match is a BROADCAST semi-style inner join evaluated map-side, and
the only shuffle is the per-doc count groupBy (map-side partials) +
the doc_id stitch back to the full corpus row set. No giant
``isin(...)`` literal expression (a 400-word isin builds a 400-branch
expression per row; the broadcast hash join does one probe per
token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.chunking import ASCII_WS_SPLIT_RE

__all__ = ["badword_hits"]

_WS_TRIM = " \t\n\x0b\f\r"

#: leading/trailing ASCII non-alphanumeric strip, applied AFTER the
#: lowercase fold on both sides of the match (two passes — \z, never
#: $, per the repo's Java-regex/RE2 agreement rule)
_EDGE_PUNCT = (r"^[^a-z0-9]+", r"[^a-z0-9]+\z")


def _fold_token(col):
    col = F.lower(col)
    for pat in _EDGE_PUNCT:
        col = F.regexp_replace(col, pat, "")
    return col


def badword_hits(docs: DataFrame, words: DataFrame,
                 text_col: str = "text") -> DataFrame:
    """``(doc_id, n_hits, first_badword, passes_wordfilter)`` — one
    row per input doc. ``words`` has one ``word`` column; it is
    folded, deduped, and broadcast."""
    wl = (
        words.select(
            _fold_token(F.btrim(F.col("word"), F.lit(_WS_TRIM)))
            .alias("_w")
        )
        .where(F.col("_w") != "")
        .distinct()
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col(text_col), ASCII_WS_SPLIT_RE),
                     lambda t: t != "")
        ).alias("_tok"),
    ).select(
        "doc_id", _fold_token(F.col("_tok")).alias("_tok")
    ).where(F.col("_tok") != "")
    hits = (
        toks.join(F.broadcast(wl), toks["_tok"] == wl["_w"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.min("_w").alias("first_badword"),
        )
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            "first_badword",
            (F.coalesce("n_hits", F.lit(0)) == 0).alias(
                "passes_wordfilter"
            ),
        )
    )
