"""robots.txt REP semantics (ops/robots.py): RFC 9309 group selection,
longest-match precedence, wildcards, and the Spark filter."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.robots import evaluate, parse_robots, rules_for_agent

ROBOTS = """
# comment line
User-agent: badbot
Disallow: /

User-agent: a
User-agent: b
Disallow: /shared/

User-agent: *
Disallow: /private/
Allow: /private/open
Disallow: /tmp/*.bak$
Disallow:
Sitemap: https://ex.test/sitemap.xml
"""


def test_group_selection_and_merging():
    g = parse_robots(ROBOTS)
    assert rules_for_agent(g, "BadBot") == [(False, "/")]
    # consecutive user-agent lines share one rule block
    assert rules_for_agent(g, "a") == [(False, "/shared/")]
    assert rules_for_agent(g, "b") == [(False, "/shared/")]
    # unknown agent falls through to *
    star = rules_for_agent(g, "testbot")
    assert (False, "/private/") in star and (True, "/private/open") in star
    # empty Disallow dropped; Sitemap ignored
    assert (False, "") not in star


def test_longest_match_and_allow_tiebreak():
    rules = [(False, "/p/"), (True, "/p/open"), (False, "/p/open")]
    assert evaluate(rules, "/p/x") == (False, "/p/")
    # longest wins; allow wins the exact tie with the same-length
    # disallow
    assert evaluate(rules, "/p/open/doc") == (True, "/p/open")
    assert evaluate(rules, "/q/") == (True, "")  # no match -> allowed


def test_wildcards_and_anchor():
    g = parse_robots(ROBOTS)
    rules = rules_for_agent(g, "x")
    assert evaluate(rules, "/tmp/a.bak")[0] is False
    assert evaluate(rules, "/tmp/a.bak.old")[0] is True  # $ anchored
    assert evaluate([(False, "/a*b")], "/aXXXb-rest")[0] is False
    # mid-string '$' is a literal, only a FINAL '$' anchors
    assert evaluate([(False, "/c$d")], "/c$d/e")[0] is False
    assert evaluate([(False, "/c$d")], "/cd/e")[0] is True


def test_rules_before_any_group_are_dropped_and_no_robots_allows():
    g = parse_robots("Disallow: /early/\nUser-agent: *\nDisallow: /x/")
    assert rules_for_agent(g, "z") == [(False, "/x/")]
    assert rules_for_agent({}, "z") == []
    assert evaluate([], "/anything") == (True, "")


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-robots-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_compile_rules_matches_uncompiled():
    from hickoryspark.ops.robots import compile_rules, evaluate_compiled

    rules = [(False, "/p/"), (True, "/p/open"), (False, "/tmp/*.bak$")]
    comp = compile_rules(rules)
    for path in ("/p/x", "/p/open/doc", "/tmp/a.bak", "/q"):
        assert evaluate_compiled(comp, path) == evaluate(rules, path)


def test_robots_filter_spark(spark):
    from hickoryspark.ops.robots import robots_filter

    pages = spark.createDataFrame(
        [("https://ex.test/private/1", ""),
         ("https://ex.test/private/open/2", ""),
         ("https://ex.test/pub/3", ""),
         ("https://nobots.test/anything", "")],
        "url string, html string",
    )
    robots = spark.createDataFrame(
        [("ex.test",
          "User-agent: *\nDisallow: /private/\nAllow: /private/open")],
        "host string, content string",
    )
    got = {r["url"]: (r["allowed"], r["matched_rule"])
           for r in robots_filter(pages, robots, "anybot").collect()}
    assert got == {
        "https://ex.test/private/1": (False, "/private/"),
        "https://ex.test/private/open/2": (True, "/private/open"),
        "https://ex.test/pub/3": (True, ""),
        "https://nobots.test/anything": (True, ""),  # no robots row
    }


def test_robots_filter_host_case_and_port_insensitive(spark):
    # review repro: 'EX.TEST:443' must hit the 'ex.test' robots row —
    # hostnames are case-insensitive and default ports are implicit
    from hickoryspark.ops.robots import robots_filter

    pages = spark.createDataFrame(
        [("https://EX.TEST:443/private/1", "")], "url string, html string"
    )
    robots = spark.createDataFrame(
        [("ex.test", "User-agent: *\nDisallow: /private/")],
        "host string, content string",
    )
    rows = robots_filter(pages, robots, "anybot").collect()
    assert rows[0]["allowed"] is False
    assert rows[0]["matched_rule"] == "/private/"


def test_query_only_url_path_evaluates_as_root(spark):
    # review repro: 'https://h?page=2' has an empty path — RFC 9309
    # evaluates it as '/?page=2', which 'Disallow: /' must match
    from hickoryspark.ops.robots import robots_filter

    pages = spark.createDataFrame(
        [("https://ex.test?page=2", ""), ("https://ex.test", "")],
        "url string, html string",
    )
    robots = spark.createDataFrame(
        [("ex.test", "User-agent: *\nDisallow: /")],
        "host string, content string",
    )
    got = {r["url"]: r["allowed"]
           for r in robots_filter(pages, robots, "anybot").collect()}
    assert got == {"https://ex.test?page=2": False,
                   "https://ex.test": False}


def test_hostile_wildcard_rule_matches_in_linear_time():
    # advice repro: '*'-dense rules are untrusted web content — the
    # old re-based matcher backtracked exponentially (>30s for 12
    # stars vs a 60-char path); the chunk matcher must be instant
    import time

    rules = [(False, "/" + "a*" * 12 + "b")]
    path = "/" + "a" * 60
    t0 = time.monotonic()
    assert evaluate(rules, path) == (True, "")  # no 'b' -> no match
    assert evaluate(rules, path + "b")[0] is False  # and it DOES match
    assert time.monotonic() - t0 < 1.0


def test_chunk_matcher_agrees_with_regex_semantics():
    # exhaustive mini-fuzz: chunk matcher vs a literal re translation
    # of the RFC semantics over every pattern/path in a small grammar
    import itertools
    import re as _re

    def re_match(value, path):
        body, anchored = (
            (value[:-1], True) if value.endswith("$") else (value, False)
        )
        pat = "".join(".*" if ch == "*" else _re.escape(ch) for ch in body)
        return bool(_re.match("^" + pat + ("$" if anchored else ""), path))

    alphabet = "ab*/"
    paths = [
        "".join(p) for k in range(4) for p in itertools.product("ab/", repeat=k)
    ]
    for k in range(6):
        for body in itertools.product(alphabet, repeat=k):
            for suffix in ("", "$"):
                value = "".join(body) + suffix
                for path in paths:
                    got = evaluate([(False, value)], path)[0] is False
                    assert got == re_match(value, path), (value, path)


def test_robots_sitemaps_extraction(spark):
    from hickoryspark.ops.robots import robots_sitemaps

    content = (
        "User-agent: *\r\n"
        "Disallow: /tmp\r\n"
        "sitemap: https://h.test/s1.xml\r\n"
        "# Sitemap: https://h.test/commented.xml\r\n"
        "  SITEMAP :\thttps://h.test/s2.xml # trailing comment\r\n"
        "Sitemap:\r\n"
        "sitemapish: https://h.test/not.xml\r\n"
    )
    df = spark.createDataFrame(
        [("h.test", content), ("empty.test", "User-agent: *\nAllow: /")],
        "host string, content string",
    )
    rows = sorted(
        robots_sitemaps(df).collect(),
        key=lambda r: (r["host"], r["sitemap_pos"]),
    )
    assert [(r["host"], r["sitemap_pos"], r["sitemap_url"]) for r in rows] == [
        ("h.test", 1, "https://h.test/s1.xml"),
        ("h.test", 2, "https://h.test/s2.xml"),
    ]


# ---------------------------------------------------------------------------
# robots_drift


def test_robots_drift_statuses_and_tightening(spark):
    from hickoryspark.ops.robots import robots_drift

    old = spark.createDataFrame(
        [
            ("same.ex", "User-agent: *\nDisallow: /x\n"),
            ("tight.ex", "User-agent: *\nDisallow: /a\n"),
            ("loose.ex", "User-agent: *\nDisallow: /a\nDisallow: /b\n"),
            ("gone.ex", "User-agent: *\nDisallow: /\n"),
            ("empty.ex", "# no rules at all\n"),
        ],
        "host string, content string",
    )
    new = spark.createDataFrame(
        [
            ("same.ex", "User-agent: *\nDisallow: /x\n"),
            ("tight.ex", "User-agent: *\nDisallow: /a\nDisallow: /b\n"),
            ("loose.ex", "User-agent: *\nDisallow: /a\nAllow: /b\n"),
            ("fresh.ex", "User-agent: *\nDisallow: /q\n"),
            ("empty.ex", "# still no rules\n"),
        ],
        "host string, content string",
    )
    out = {r["host"]: r for r in robots_drift(old, new).collect()}
    assert out["same.ex"]["status"] == "unchanged"
    assert out["same.ex"]["tightened"] is False
    t = out["tight.ex"]
    assert (t["n_added"], t["n_removed"], t["status"], t["tightened"]) == (
        1, 0, "changed", True)
    lo = out["loose.ex"]
    # removed Disallow /b, added Allow /b: loosening, not tightening
    assert (lo["n_added"], lo["n_removed"], lo["tightened"]) == (1, 1, False)
    assert out["gone.ex"]["status"] == "removed_host"
    assert out["fresh.ex"]["status"] == "added_host"
    # a rule-free host is still PRESENT in both snapshots
    assert out["empty.ex"]["status"] == "unchanged"
    assert len(out) == 6
