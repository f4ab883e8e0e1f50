"""Porter stemming — the classic IR token normalizer.

Search-side term matching (ops/retrieval.py BM25 / phrase search),
keyword extraction, and vocabulary induction all improve when
inflected forms collapse to one stem; Porter (1980, "An algorithm
for suffix stripping", Program 14(3)) is the canonical English
stemmer and is implemented here FROM THE PUBLISHED DEFINITION —
the five-step rule cascade exactly as the paper specifies it
(including the paper's own worked examples as the test vectors;
tests/test_stem.py). The later "Porter2/English" Snowball revisions
(e.g. the logi→log and early-y amendments) are deliberately NOT
applied — this is the 1980 algorithm, pinned.

Pinned semantics:

- tokens of length < 3 return unchanged (the paper's k>1 guard);
- only tokens matching ``[a-z]+`` are stemmed; anything else
  (uppercase, digits, punctuation, non-ASCII) returns unchanged —
  case folding is the caller's tokenizer policy, not the stemmer's;
- measure m, vowel test (y is a vowel exactly when preceded by a
  consonant or at position 0 it is a consonant — the paper's cons()
  definition), *o (CVC, final consonant not w/x/y) and *d (double
  consonant) conditions all per the paper.

Scale shape: pure per-token string work — a shuffle-free mapInPandas
pass over a word column (the sanctioned Python-in-Arrow cost class;
there is no JVM stemming primitive and the rule cascade does not
reduce to a bounded regexp program).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = ["porter_stem", "stem_words"]

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    # m of [C](VC)^m[V]: count V->C transitions
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3)
            and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1)
            and w[-1] not in "wxy")


def _rule_mgt0(w: str, rules: tuple[tuple[str, str], ...]) -> str:
    """Apply the first matching (suffix, replacement) whose stem has
    m > 0; longest-suffix-wins is encoded by rule order (the paper
    lists them longest-first per final letter)."""
    for suf, rep in rules:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                return stem + rep
            return w
    return w


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"),
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
    "ize",
)


def porter_stem(word: str) -> str:
    if len(word) < 3 or not word.isascii() or not word.isalpha() \
            or not word.islower():
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        fired = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            fired = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            fired = True
        if fired:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 / Step 3 (m > 0 conditions)
    w = _rule_mgt0(w, _STEP2)
    w = _rule_mgt0(w, _STEP3)

    # Step 4 (m > 1; ion additionally needs *S or *T before it)
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1 and (
                    suf != "ion" or (stem and stem[-1] in "st")):
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def stem_words(df: DataFrame, word_col: str = "word",
               out_col: str = "stem") -> DataFrame:
    """Append ``out_col`` = Porter stem of ``word_col`` — one
    shuffle-free mapInPandas pass."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.copy()
            b[out_col] = [
                None if wd is None else porter_stem(wd)
                for wd in b[word_col]
            ]
            yield b

    return df.mapInPandas(gen, schema)
