"""Frontier priority composition (ops/frontier.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-frontier-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, urls, stability=None, delays=None, **kw):
    from hickoryspark.ops.frontier import frontier_priority

    p = spark.createDataFrame([(u,) for u in urls], "url string")
    st = (None if stability is None else spark.createDataFrame(
        stability, "url string, stability_milli long"))
    dl = (None if delays is None else spark.createDataFrame(
        delays, "host string, delay_ms long"))
    return {r["url"]: (r["host"], r["priority_milli"])
            for r in frontier_priority(p, st, dl, **kw).collect()}


def test_formula_terms(spark):
    out = _run(
        spark,
        ["https://a.ex/",                       # root
         "https://a.ex/x/y/p.html?a=1&b=2",     # depth 3, 2 params
         "https://b.ex/c"],                     # depth 1
        stability=[("https://a.ex/", 900),
                   ("https://b.ex/c", 200)],
        delays=[("a.ex", 4000)],
    )
    # root: 0 depth + 0 params + 0 root + 900 stab + 400 delay
    assert out["https://a.ex/"] == ("a.ex", 1300)
    # depth3: 3000 + 200 + 500 + 500 default stab + 400 delay
    assert out["https://a.ex/x/y/p.html?a=1&b=2"] == ("a.ex", 4600)
    # b.ex: 1000 + 0 + 500 + 200 + 0 (no delay row)
    assert out["https://b.ex/c"] == ("b.ex", 1700)


def test_absent_frames_use_defaults(spark):
    out = _run(spark, ["https://a.ex/"])
    assert out["https://a.ex/"] == ("a.ex", 500)
    out2 = _run(spark, ["https://a.ex/"], **{"default_stability": 0})
    assert out2["https://a.ex/"] == ("a.ex", 0)


def test_hostless_url_gets_no_delay(spark):
    # url_features pins relative urls to NULL host + '' path (which
    # counts as root): only the default stability contributes, and
    # the delay join can never attach
    out = _run(spark, ["rel/x"], delays=[("a.ex", 9000)])
    (host, pr), = out.values()
    assert host is None
    assert pr == 500


def test_custom_weights(spark):
    # review regression: the docstring promises re-weighting kwargs
    from hickoryspark.ops.frontier import frontier_priority

    p = spark.createDataFrame(
        [("https://a.ex/x/y",)], "url string")
    row = frontier_priority(
        p, w_depth=1, w_param=0, w_nonroot=10,
        default_stability=0).collect()[0]
    assert row["priority_milli"] == 2 * 1 + 10
