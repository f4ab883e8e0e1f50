"""Schwartz-Hearst abbreviation extraction (ops/abbrev.py): paper
examples, validity conditions, window bound, pruning, Spark path."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.abbrev import (  # noqa: E402
    extract_abbrev_pairs,
    find_best_long_form,
)


def pairs(text):
    return [(s, l) for s, l, _ in extract_abbrev_pairs(text)]


def test_paper_examples():
    assert pairs("Gcn5-related N-acetyltransferase (GNAT) family") == [
        ("GNAT", "Gcn5-related N-acetyltransferase")]
    assert pairs("the heat shock protein (HSP) level") == [
        ("HSP", "heat shock protein")]


def test_first_char_must_start_word():
    # 'T' of TF must match a word START: "transcription factor" ok,
    # but a long form where 't' only appears word-internally fails.
    assert pairs("transcription factor (TF) x") == [
        ("TF", "transcription factor")]
    assert pairs("abstraction (TN) x") == []


def test_validity_conditions():
    assert pairs("numbers only (123) x") == []          # no letter
    assert pairs("three word sf (a b c) x") == []       # > 2 tokens
    assert pairs("too long (abcdefghijkl) x") == []     # > 10 chars
    assert pairs("one char (a) x") == []                # < 2 chars
    assert pairs("punct first (-ab) x") == []           # first not alnum


def test_pruning():
    # long form equal to / containing the short form is rejected
    assert pairs("the ABC (ABC) dup") == []
    assert pairs("my ABC groups (ABC) dup") == []


def test_window_bound():
    # window = min(|SF|+5, 2*|SF|) tokens: SF 'AB' looks back 4 tokens
    # only — 'alpha' 5 tokens back is out of reach.
    assert pairs("alpha w x y z beta (AB) t") == []


def test_multiple_and_positions():
    got = extract_abbrev_pairs("alpha beta (AB) and gamma delta (GD) t")
    assert got == [("AB", "alpha beta", 11),
                   ("GD", "gamma delta", 32)]


def test_nested_open_paren_rescans():
    # the inner '(' wins; the stray outer '(' stays part of the long
    # form, exactly as the paper's lastIndexOf(' ') word snap keeps it
    # ('(' is non-alnum, so 'a' after it is a valid word start).
    assert pairs("junk (alpha beta (AB) tail") == [
        ("AB", "(alpha beta")]


def test_digit_in_short_form():
    assert pairs("unit w3 group (WG) end") == [("WG", "w3 group")]


def test_hostile_no_crash():
    extract_abbrev_pairs("(((((" + ")" * 5)
    extract_abbrev_pairs("(" * 10000)
    extract_abbrev_pairs("a (bb" )  # unterminated


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-abbrev-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_spark_path(spark):
    from hickoryspark.ops.abbrev import abbrev_pairs

    docs = spark.createDataFrame(
        [(1, "the heat shock protein (HSP) x"),
         (2, None),
         (3, "numbers only (123) x")],
        "doc_id long, text string")
    got = sorted(tuple(r) for r in abbrev_pairs(docs).collect())
    assert got == [(1, "HSP", "heat shock protein", 23)]


def test_ascii_ws_pinned_not_unicode():
    # regression (r5 review): U+00A0 is NOT a separator in the pinned
    # ASCII dialect. SF 'a\u00a0b c' is 2 ASCII tokens (valid) but 3
    # under Python's Unicode .split() (which would reject it) — the
    # pair must be extracted.
    assert pairs("aaa bbb ccc (a\u00a0b c)") == [
        ("a\u00a0b c", "aaa bbb ccc")]
