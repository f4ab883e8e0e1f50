"""Line-level corpus dedup (ops/lines.py): key trimming, document
frequency, threshold, reassembly order, counts."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-lines-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _result(spark, texts, min_docs=2):
    from hickoryspark.ops.lines import dedup_lines

    rows = dedup_lines(_docs(spark, texts), min_docs=min_docs).collect()
    return {r["doc_id"]: r for r in rows}


def test_boilerplate_line_stripped(spark):
    out = _result(spark, [
        "unique zero\nsubscribe now\ntail zero",
        "unique one\nsubscribe now",
        "solo doc",
    ])
    assert out[0]["text"] == "unique zero\ntail zero"
    assert out[0]["n_lines_kept"] == 2 and out[0]["n_lines_removed"] == 1
    assert out[1]["text"] == "unique one"
    assert out[2]["text"] == "solo doc"
    assert out[2]["n_lines_removed"] == 0


def test_key_is_ascii_trimmed_but_output_verbatim(spark):
    # '  subscribe now\t' matches 'subscribe now' (key trim), and the
    # KEPT lines keep their original bytes
    out = _result(spark, [
        "a\n  subscribe now\t",
        "subscribe now\nb",
        " c ",
    ])
    assert out[0]["text"] == "a"
    assert out[1]["text"] == "b"
    assert out[2]["text"] == " c "  # verbatim, not trimmed


def test_document_frequency_not_occurrences(spark):
    # one doc repeating a line 3x does NOT make it corpus-frequent
    out = _result(spark, ["x\nx\nx", "y"])
    assert out[0]["text"] == "x\nx\nx"
    out2 = _result(spark, ["x\nx\nx", "x"])  # now 2 distinct docs
    assert out2[0]["text"] == "" and out2[0]["n_lines_removed"] == 3
    assert out2[1]["text"] == ""


def test_empty_key_lines_always_kept_never_counted(spark):
    # blank / whitespace-only lines appear in both docs but survive
    out = _result(spark, ["a\n\n \nb", "c\n\n \nd"])
    assert out[0]["text"] == "a\n\n \nb"
    assert out[0]["n_lines_kept"] == 4 and out[0]["n_lines_removed"] == 0


def test_min_docs_threshold(spark):
    texts = ["t\nu0", "t\nu1", "t\nu2"]
    assert _result(spark, texts, min_docs=4)[0]["text"] == "t\nu0"
    assert _result(spark, texts, min_docs=3)[0]["text"] == "u0"


def test_all_docs_present_even_when_fully_stripped(spark):
    out = _result(spark, ["t", "t"])
    assert set(out) == {0, 1}
    assert out[0]["text"] == "" and out[0]["n_lines_kept"] == 0


def test_order_preserved(spark):
    texts = ["k1\ndrop\nk2\ndrop\nk3", "drop"]
    out = _result(spark, texts)
    assert out[0]["text"] == "k1\nk2\nk3"


def test_frequencies_relation(spark):
    from hickoryspark.ops.lines import line_doc_frequencies

    rows = line_doc_frequencies(_docs(spark, ["a\nb\na", "b\n b "]))
    freq = {r["key"]: r["n_docs"] for r in rows.collect()}
    assert freq == {"a": 1, "b": 2}
