"""Hidden-text (cloaking) audit (ops/cloaking.py): carrier rules,
once-only counting under nested carriers, the visible-text universe,
and the interval-join plan shape."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-cloaking-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _stats(spark, pages):
    from hickoryspark.ops.cloaking import hidden_text_stats
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in pages], "url string, html binary")
    return {
        r["url"]: (r["n_hidden_carriers"], r["n_text_chars"],
                   r["n_hidden_chars"], r["hidden_char_ppm"])
        for r in hidden_text_stats(explode_nodes(df)).collect()
    }


def test_style_carrier_case_and_ws(spark):
    got = _stats(spark, [
        ("u1", '<div style="DISPLAY : None ; color:red">secret</div>'
               "<p>vis</p>"),
        ("u2", '<div style="visibility:HIDDEN">ab</div><p>xy</p>'),
        # display:none inside a VALUE only (no colon split match)
        ("u3", '<div style="content:display:none">ok</div>'),
    ])
    assert got["u1"] == (1, 9, 6, (1000000 * 6) // 9)
    assert got["u2"] == (1, 4, 2, 500000)
    # 'content' -> 'display:none' — name is 'content', never hidden
    assert got["u3"] == (0, 2, 0, 0)


def test_boolean_hidden_and_aria(spark):
    got = _stats(spark, [
        ("u1", "<div hidden>ab</div><p>x</p>"),
        ("u2", '<div aria-hidden=" TRUE ">ab</div>'),
        ("u3", '<div aria-hidden="false">ab</div>'),
        ("u4", '<div hidden="">ab</div>'),
    ])
    assert got["u1"] == (1, 3, 2, 666666)
    assert got["u2"] == (1, 2, 2, 1000000)
    assert got["u3"] == (0, 2, 0, 0)
    assert got["u4"] == (1, 2, 2, 1000000)


def test_nested_carriers_count_once(spark):
    got = _stats(spark, [
        ("u1", '<div hidden><span style="display:none">ab</span></div>'),
    ])
    # two carriers, the 2 chars counted ONCE
    assert got["u1"] == (2, 2, 2, 1000000)


def test_script_text_excluded_from_universe(spark):
    got = _stats(spark, [
        ("u1", '<div style="display:none"><script>var xxx=1;</script>'
               "ab</div><p>cd</p>"),
        # a page with NO text at all: ppm 0, row still emitted
        ("u2", "<div hidden></div>"),
    ])
    assert got["u1"] == (1, 4, 2, 500000)
    assert got["u2"] == (1, 0, 0, 0)


def test_plan_no_nested_loop(spark):
    from hickoryspark.ops.cloaking import hidden_text_stats
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame(
        [("u", b"<div hidden>x</div>")], "url string, html binary")
    out = hidden_text_stats(explode_nodes(df))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
