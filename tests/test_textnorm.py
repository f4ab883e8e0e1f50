"""Unicode text normalization (ops/textnorm.py): NFC composition,
control stripping, ASCII whitespace collapse — scalar and Spark
paths, and the order-of-operations contract with the DuckDB oracle."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.textnorm import normalize_string


def test_nfc_composes_but_keeps_compatibility_forms():
    assert normalize_string("café") == "café"
    # NFC, not NFKC: the ligature and fullwidth forms are content
    assert normalize_string("ﬁn ４２") == "ﬁn ４２"


def test_controls_stripped_whitespace_collapsed():
    assert normalize_string("a\x00b\x07c") == "abc"
    assert normalize_string("  a \t\n b\f ") == "a b"
    assert normalize_string("\t\r\n") == ""
    # C1 range strips too
    assert normalize_string("x\x85y\x9dz") == "xyz"


def test_unicode_spaces_are_content():
    # deliberately ASCII-only collapse (engines disagree on \s)
    assert normalize_string("a b") == "a b"
    assert normalize_string("a b") == "a b"


def test_order_controls_before_collapse():
    # a control BETWEEN spaces: stripping first makes one run
    assert normalize_string("a \x07 b") == "a b"


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-textnorm-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_normalize_text_spark_matches_scalar_and_flags_changed(spark):
    from hickoryspark.ops.textnorm import normalize_text

    rows = [
        (1, "plain text"),
        (2, "café  double"),
        (3, None),
        (4, "\x07"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["norm_text"], r["changed"])
           for r in normalize_text(df).collect()}
    assert got[1] == ("plain text", False)
    assert got[2] == ("caf\u00e9 double", True)
    assert got[3] == ("", False)  # NULL -> '' and '' == '' unchanged
    assert got[4] == ("", True)
    for did, text in rows:
        if text is not None:
            assert got[did][0] == normalize_string(text)
