"""Paragraph-level keep-first dedup (ops/paragraphs.py): split
semantics, global first-occurrence rule, reassembly, counters."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-paragraphs-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, docs):
    from hickoryspark.ops.paragraphs import dedup_paragraphs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: (r["text"], r["n_paras_kept"],
                          r["n_paras_removed"])
            for r in dedup_paragraphs(df).collect()}


def test_keep_first_across_docs(spark):
    got = _run(spark, [
        (0, "unique a\n\nshared block\n\nunique b"),
        (1, "shared block\n\nunique c"),
        (2, "unique d\n\nshared block"),
    ])
    assert got[0] == ("unique a\n\nshared block\n\nunique b", 3, 0)
    assert got[1] == ("unique c", 1, 1)
    assert got[2] == ("unique d", 1, 1)


def test_repeat_inside_first_doc_dropped(spark):
    got = _run(spark, [(0, "x\n\nx\n\ny")])
    assert got[0] == ("x\n\ny", 2, 1)


def test_key_trims_space_tab_only(spark):
    got = _run(spark, [(0, "  block\t"), (1, "block")])
    # trimmed keys match; doc 0 (as written) is the kept occurrence
    assert got[0] == ("  block\t", 1, 0)
    assert got[1] == ("", 0, 1)


def test_empty_key_paragraphs_always_kept(spark):
    got = _run(spark, [(0, " \n\n \n\na"), (1, " ")])
    assert got[0] == (" \n\n \n\na", 3, 0)
    assert got[1] == (" ", 1, 0)


def test_separator_runs_collapse(spark):
    got = _run(spark, [(0, "a\n\n\n\nb"), (1, "c")])
    assert got[0] == ("a\n\nb", 2, 0)


def test_single_newline_stays_inside_paragraph(spark):
    # 'a\nb' is ONE paragraph; doc 1 duplicates it and loses it
    got = _run(spark, [(0, "a\nb\n\nc"), (1, "a\nb")])
    assert got[0] == ("a\nb\n\nc", 2, 0)
    assert got[1] == ("", 0, 1)
    got2 = _run(spark, [(0, "a\nb"), (1, "a\nb\n\nz")])
    assert got2[0] == ("a\nb", 1, 0)
    assert got2[1] == ("z", 1, 1)


def test_fully_duplicate_doc_yields_empty_row(spark):
    got = _run(spark, [(0, "only"), (1, "only")])
    assert got[1] == ("", 0, 1)
    assert set(got) == {0, 1}
