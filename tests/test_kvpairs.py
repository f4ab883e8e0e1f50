"""Definition-list kv extraction (ops/kvpairs.py): dt/dd pairing,
shared dts, lone dts, leading dd drop, nested markup text, multiple
dls, non-dl dt exclusion."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-kvpairs-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, pages):
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.ops.kvpairs import definition_pairs

    df = spark.createDataFrame(pages, "url string, html string")
    rows = definition_pairs(explode_nodes(df)).collect()
    return sorted(
        (r["url"], r["dl_pos"], r["pair_pos"], r["key"], r["value"])
        for r in rows
    )


def test_pairing_rules(spark):
    html = (
        "<dl>"
        "<dd>orphan dropped</dd>"
        "<dt>A</dt><dd>1</dd>"
        "<dt>B</dt><dd>2</dd><dd>3</dd>"
        "<dt>lone</dt>"
        "<dt>C</dt><dd>4</dd>"
        "</dl>"
        "<dl><dt>X</dt><dd><b>bo</b>ld<!--c--></dd></dl>"
        "<dt>outside</dt><dd>ignored</dd>"
    )
    got = _run(spark, [("u", html)])
    want = sorted([
        ("u", 1, 1, "A", "1"),
        ("u", 1, 2, "B", "2"),
        ("u", 1, 3, "B", "3"),
        ("u", 1, 4, "lone", None),
        ("u", 1, 5, "C", "4"),
        # nested markup flattens to subtree text; comment data counts
        ("u", 2, 1, "X", "bold" + "c"),
    ])
    assert got == want


def test_empty_and_partition_invariance(spark):
    html = "<dl></dl><dl><dt></dt><dd> </dd></dl>"
    got = _run(spark, [("u", html)])
    # empty dl emits nothing; empty dt/dd texts are '' / ' '
    assert got == [("u", 2, 1, "", " ")]

    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.ops.kvpairs import definition_pairs

    pages = [(f"u{i}", "<dl><dt>k</dt><dd>v</dd><dd>w</dd></dl>")
             for i in range(40)]
    df = spark.createDataFrame(pages, "url string, html string")
    a = sorted(map(tuple, definition_pairs(explode_nodes(df)).collect()))
    b = sorted(map(tuple, definition_pairs(
        explode_nodes(df.repartition(7))).collect()))
    assert a == b and len(a) == 80
