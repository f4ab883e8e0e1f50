"""MathML island extraction (ops/mathml.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-mathml-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _math(spark, html):
    from hickoryspark.ops.mathml import extract_math
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return sorted(tuple(r)[1:] for r in
                  extract_math(explode_nodes(pages)).collect())


def test_basic_island_block_display(spark):
    got = _math(
        spark, '<math display="block"><mi>x</mi><mo>=</mo><mn>1</mn>'
               "</math>")
    assert got == [(1, "block", None, "x=1")]


def test_display_case_fold_and_numbering(spark):
    got = _math(
        spark, "<math><mn>1</mn></math><math display=\"BLOCK\">"
               "<mn>2</mn></math>")
    assert got == [(1, "inline", None, "1"), (2, "block", None, "2")]


def test_annotation_excluded_alttext_carried(spark):
    got = _math(
        spark,
        '<math alttext="a+b"><semantics><mi>y</mi>'
        '<annotation encoding="application/x-tex">\\frac</annotation>'
        "<annotation-xml>alt content</annotation-xml>"
        "</semantics></math>")
    assert got == [(1, "inline", "a+b", "y")]


def test_annotation_only_island_keeps_empty_row(spark):
    got = _math(
        spark, "<math><annotation>tex only</annotation></math>")
    assert got == [(1, "inline", None, "")]


def test_nested_island_not_suppressed_by_outer_annotation(spark):
    # the annotation is a descendant of the OUTER island (its text is
    # excluded there) but an ANCESTOR of the inner island, whose own
    # row keeps its content
    got = _math(
        spark,
        "<math><mi>o</mi><annotation-xml encoding=\"text/html\">"
        "<math><mn>42</mn></math></annotation-xml></math>")
    assert got == [(1, "inline", None, "o"),
                   (2, "inline", None, "42")]


def test_no_math_no_rows_and_svg_not_math(spark):
    assert _math(spark, "<p>x</p><svg><title>t</title></svg>") == []


def test_trim_and_empty_display_attr(spark):
    got = _math(spark, '<math display=""> <mi> z </mi> </math>')
    assert got == [(1, "inline", None, "z")]
