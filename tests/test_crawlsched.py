"""Revisit scheduling signals: change_stability (ops/snapshots.py)
and robots Crawl-delay parsing (ops/robots.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-crawlsched-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# ---------------------------------------------------------------- stability

def test_change_stability_exact_values(spark):
    from hickoryspark.ops.snapshots import change_stability

    obs = spark.createDataFrame(
        [("a", True), ("a", False), ("a", False), ("a", False),
         ("b", True), ("b", True),
         ("c", False),
         ("d", None)],
        "url string, changed boolean")
    out = {r["url"]: (r["n_obs"], r["n_changed"], r["stability_milli"])
           for r in change_stability(obs).collect()}
    # a: n=4 X=1 -> 1000*7 div 9 = 777
    assert out["a"] == (4, 1, 777)
    # b: n=2 X=2 -> 1000*1 div 5 = 200
    assert out["b"] == (2, 2, 200)
    # c: n=1 X=0 -> 1000*3 div 3 = 1000
    assert out["c"] == (1, 0, 1000)
    # d: NULL changed counts as unchanged observation
    assert out["d"] == (1, 0, 1000)


def test_stability_orders_like_float_estimator(spark):
    from hickoryspark.ops.snapshots import change_stability

    rows = []
    for i, (n, x) in enumerate([(1, 0), (2, 1), (3, 1), (5, 4),
                                (7, 0), (9, 9)]):
        rows += [(f"u{i}", j < x) for j in range(n)]
    obs = spark.createDataFrame(rows, "url string, changed boolean")
    got = {r["url"]: r["stability_milli"]
           for r in change_stability(obs).collect()}
    flt = {f"u{i}": (n - x + 0.5) / (n + 0.5)
           for i, (n, x) in enumerate([(1, 0), (2, 1), (3, 1), (5, 4),
                                       (7, 0), (9, 9)])}
    assert (sorted(got, key=lambda u: (got[u], u))
            == sorted(flt, key=lambda u: (flt[u], u)))


# ---------------------------------------------------------------- crawl-delay

def test_parse_crawl_delays_groups_and_values():
    from hickoryspark.ops.robots import parse_crawl_delays

    txt = """
Crawl-delay: 9        # before any group: dropped
User-agent: a
User-agent: b
Crawl-delay: 2
Disallow: /x
Crawl-delay: 0.5      # same group, smaller: max wins
User-agent: b
Crawl-delay: 7.25     # merged group, larger: wins for b
User-agent: c
Crawl-delay: nope
Crawl-delay: -3
Crawl-delay: 99999999
"""
    d = parse_crawl_delays(txt)
    assert d["a"] == 2000
    assert d["b"] == 7250
    assert "c" not in d


def test_host_crawl_delays_agent_fallback(spark):
    from hickoryspark.ops.robots import host_crawl_delays

    robots = spark.createDataFrame(
        [("h1", "User-agent: testbot\nCrawl-delay: 1.5\n"
                "User-agent: *\nCrawl-delay: 4"),
         ("h2", "User-agent: *\nCrawl-delay: 4"),
         ("h3", "User-agent: other\nCrawl-delay: 4"),
         ("h4", None)],
        "host string, content string")
    out = {r["host"]: r["delay_ms"]
           for r in host_crawl_delays(robots, agent="TestBot",
                                      default_ms=250).collect()}
    assert out == {"h1": 1500, "h2": 4000, "h3": 250, "h4": 250}


def test_crawl_delay_exact_ms_and_strict_decimal():
    # review regression: '1.005' is exactly 1005 ms (float*1000 gave
    # 1004); non-plain-decimal spellings are unparseable, not floats
    from hickoryspark.ops.robots import parse_crawl_delays

    def one(v):
        return parse_crawl_delays(f"User-agent: a\nCrawl-delay: {v}\n")

    assert one("1.005") == {"a": 1005}
    assert one("0.0005") == {"a": 0}
    assert one("86400") == {"a": 86400000}
    assert one("86400.001") == {}
    assert one("1_5") == {}
    assert one("1e3") == {}
    assert one("+2") == {}
    assert one("nan") == {}


def test_group_iterator_shared_between_parsers():
    # the pinned 'same agent-run rule' equivalence is structural:
    # both parsers consume _group_lines
    import inspect

    from hickoryspark.ops import robots

    assert "_group_lines" in inspect.getsource(robots.parse_robots)
    assert "_group_lines" in inspect.getsource(robots.parse_crawl_delays)
