"""hreflang reciprocity audit (ops/metadata.hreflang_symmetry)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-hreflang-sym-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _sym(spark, pages):
    from hickoryspark.ops.metadata import hreflang_symmetry
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame(pages, "url string, html string")
    return sorted(tuple(r) for r in
                  hreflang_symmetry(explode_nodes(df)).collect())


A = "https://s.ex/en"
B = "https://s.ex/de"
C = "https://s.ex/fr"


def test_reciprocal_oneway_and_self_excluded(spark):
    got = _sym(spark, [
        (A, '<link rel=alternate hreflang=en href="en">'
            '<link rel=alternate hreflang=de href="de">'
            '<link rel=alternate hreflang=fr href="fr">'),
        (B, '<link rel=alternate hreflang=en href="en">'),
        (C, "<p>no alternates</p>"),
    ])
    assert got == [
        (B, A, 1), (A, B, 1), (A, C, 0),
    ]


def test_normalization_bridges_port_variants(spark):
    got = _sym(spark, [
        (A, '<link rel=alternate hreflang=de href="de">'),
        (B, '<link rel=alternate hreflang=en '
            'href="https://s.ex:443/en">'),
    ])
    assert got == [(B, A, 1), (A, B, 1)]


def test_duplicate_annotations_count_once(spark):
    got = _sym(spark, [
        (A, '<link rel=alternate hreflang=de href="de">'
            '<link rel=alternate hreflang=de-AT href="de">'),
    ])
    assert got == [(A, B, 0)]
