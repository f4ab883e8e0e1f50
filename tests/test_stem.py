"""Porter stemmer (ops/stem.py): the 1980 paper's worked examples
traced through the full cascade (hand-derived vectors), guard rails
(short / non-lowercase / non-ASCII tokens), and the Spark path."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.stem import porter_stem  # noqa: E402

#: (word, stem) — the paper's per-step examples run through the FULL
#: algorithm (hand-derived; e.g. step-2's "relational → relate"
#: continues through step 4/5a to "relat")
VECTORS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b + cleanup
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky", "enjoy": "enjoi",
    # step 2 (through the rest of the cascade)
    "relational": "relat", "conditional": "condit",
    "rational": "ration", "valency": "valenc", "hesitancy": "hesit",
    "digitizer": "digit", "generalization": "gener",
    "oscillators": "oscil", "ability": "abil",
    # step 3
    "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electricity": "electr",
    "electrical": "electr", "hopefulness": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "effective": "effect",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controlling": "control", "rolling": "roll",
}


def test_paper_vectors():
    bad = {w: (porter_stem(w), s) for w, s in VECTORS.items()
           if porter_stem(w) != s}
    assert not bad, bad


def test_guards_unchanged():
    for w in ["a", "is", "", "Cats", "CATS", "café", "win32", "a-b",
              "don't"]:
        assert porter_stem(w) == w


def test_measure_zero_suffix_words_survive():
    # whole word IS the suffix: m=0 stems must not strip in step 4
    # (5a may still drop a final e at m=1 when the stem is not CVC —
    # matches the reference C implementation: ate→at, able→abl)
    assert porter_stem("ate") == "at"
    assert porter_stem("ion") == "ion"
    assert porter_stem("able") == "abl"


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-stem-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_stem_words_df(spark):
    from hickoryspark.ops.stem import stem_words

    df = spark.createDataFrame(
        [("relational",), ("sky",), (None,)], "word string")
    rows = {r["word"]: r["stem"] for r in stem_words(df).collect()}
    assert rows == {"relational": "relat", "sky": "sky", None: None}
