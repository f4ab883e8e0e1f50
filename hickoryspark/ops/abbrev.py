"""Abbreviation-definition extraction — Schwartz & Hearst (PSB 2003),
"A simple algorithm for identifying abbreviation definitions in
biomedical text". The standard glossary-mining op for a web corpus:
``long form (SF)`` patterns become (doc, short_form, long_form) rows
feeding query expansion, entity dictionaries, and KB seeding.

Pinned dialect (documented subset of the paper):

- only the ``long form (SHORT)`` direction is mined (the paper's
  swapped ``SHORT (long form)`` case needs sentence segmentation to
  bound the right context; out of scope here);
- a candidate short form is the text inside one ``( ... )`` pair with
  no nested ``(``; valid iff 2 <= len <= 10 chars after ASCII-ws trim,
  at most 2 ASCII-ws tokens, contains >= 1 ASCII letter, first char
  ASCII alphanumeric (the paper's conditions, ASCII-pinned);
- the long-form candidate window is the last ``min(|SF| + 5,
  |SF| * 2)`` ASCII-ws tokens before the ``(`` (the paper's bound; no
  sentence split — the window itself bounds the context);
- ``find_best_long_form`` is the paper's right-to-left character
  matcher verbatim: every SF alnum char must appear in order
  (case-folded via ASCII lower), and the FIRST SF char must match at
  the start of a long-form word (previous char non-alnum);
- a match is accepted iff the long form is strictly longer (chars)
  than the short form and does not contain the short form as a
  substring (the paper's pruning).

Everything is per-document Python over Arrow batches (mapInPandas —
character-level right-to-left matching has no relational form); the
op is shuffle-free: one scan, no exchanges. Gate oracles are
closed-form per-variant literals over planted text.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["find_best_long_form", "extract_abbrev_pairs",
           "abbrev_pairs"]

_ASCII_WS = " \t\n\x0b\f\r"


def _ascii_split(s: str) -> list[str]:
    """ASCII-ws tokenization (Python's str.split() is Unicode-aware
    and would diverge from the pinned dialect — the CLAUDE.md rule)."""
    toks: list[str] = []
    word: list[str] = []
    for c in s:
        if c in _ASCII_WS:
            if word:
                toks.append("".join(word))
                word = []
        else:
            word.append(c)
    if word:
        toks.append("".join(word))
    return toks


def _is_alnum(c: str) -> bool:
    return ("a" <= c <= "z") or ("A" <= c <= "Z") or ("0" <= c <= "9")


def _lower(c: str) -> str:
    return chr(ord(c) + 32) if "A" <= c <= "Z" else c


def find_best_long_form(short: str, cand: str) -> str | None:
    """The paper's ``findBestLongForm`` verbatim (ASCII case fold):
    match SF chars right-to-left into ``cand``; the first SF char must
    start a word. Returns the matched suffix of ``cand`` snapped back
    to a word start, or None."""
    s = len(short) - 1
    l = len(cand) - 1
    while s >= 0:
        c = _lower(short[s])
        if not _is_alnum(c):
            s -= 1
            continue
        while l >= 0 and (
            _lower(cand[l]) != c
            or (s == 0 and l > 0 and _is_alnum(cand[l - 1]))
        ):
            l -= 1
        if l < 0:
            return None
        s -= 1
        l -= 1
    # snap to the start of the word containing position l + 1
    start = 0
    for i in range(l, -1, -1):
        if cand[i] in _ASCII_WS:
            start = i + 1
            break
    return cand[start:]


def _valid_short(sf: str) -> bool:
    if not (2 <= len(sf) <= 10):
        return False
    if len(_ascii_split(sf)) > 2:
        return False
    if not _is_alnum(sf[0]):
        return False
    return any(("a" <= c <= "z") or ("A" <= c <= "Z") for c in sf)


def extract_abbrev_pairs(text: str) -> list[tuple[str, str, int]]:
    """All (short_form, long_form, paren_pos) pairs in ``text``;
    ``paren_pos`` is the 0-based char offset of the ``(``."""
    out: list[tuple[str, str, int]] = []
    i = 0
    n = len(text)
    while True:
        i = text.find("(", i)
        if i < 0:
            break
        close = text.find(")", i + 1)
        inner_open = text.find("(", i + 1)
        if close < 0:
            break
        if 0 <= inner_open < close:
            i = inner_open
            continue
        sf = text[i + 1:close].strip(_ASCII_WS)
        pos = i
        i = close + 1
        if not sf or not _valid_short(sf):
            continue
        before = text[:pos].rstrip(_ASCII_WS)
        toks = _ascii_split(before)
        if not toks:
            continue
        window = min(len(sf) + 5, len(sf) * 2)
        cand = " ".join(toks[-window:])
        lf = find_best_long_form(sf, cand)
        if lf is None:
            continue
        if len(lf) <= len(sf) or sf in lf:
            continue
        out.append((sf, lf, pos))
    return out


_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("short_form", T.StringType()),
    T.StructField("long_form", T.StringType()),
    T.StructField("paren_pos", T.LongType()),
])


def abbrev_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, short_form, long_form, paren_pos) rows for every
    accepted definition pattern in ``docs[text_col]`` (NULL text
    yields no rows). Shuffle-free: one mapInPandas scan."""
    src = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col(text_col).alias("_t"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            ids = pdf["doc_id"].tolist()
            texts = pdf["_t"].tolist()
            for did, txt in zip(ids, texts):
                if txt is None or (isinstance(txt, float)):
                    continue
                for sf, lf, pos in extract_abbrev_pairs(txt):
                    rows.append((did, sf, lf, pos))
            yield pd.DataFrame(
                rows, columns=["doc_id", "short_form", "long_form",
                               "paren_pos"])

    return src.mapInPandas(run, _SCHEMA)
