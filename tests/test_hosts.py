"""Host blocklist filtering and rollups (ops/hosts.py): host
extraction, suffix chains, subdomain blocking, stats."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-hosts-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _host(spark, url):
    from hickoryspark.ops.hosts import url_host
    from pyspark.sql import functions as F

    return spark.range(1).select(
        url_host(F.lit(url)).alias("h")).collect()[0]["h"]


def test_url_host_fold_port_userinfo(spark):
    assert _host(spark, "https://EX.Test/p") == "ex.test"
    assert _host(spark, "http://a.B.c:8080/x") == "a.b.c"
    assert _host(spark, "ftp://user:pw@Host.NET/f") == "host.net"
    assert _host(spark, "relative/path") is None
    assert _host(spark, "mailto:x@y.z") is None  # no authority


def test_host_suffix_chain(spark):
    from hickoryspark.ops.hosts import host_suffixes
    from pyspark.sql import functions as F

    rows = spark.range(1).select(
        host_suffixes(F.lit("a.b.example.com")).alias("s")).collect()
    assert rows[0]["s"] == ["a.b.example.com", "b.example.com",
                            "example.com", "com"]


def test_suffix_chain_label_cap(spark):
    from hickoryspark.ops.hosts import LABEL_CAP, host_suffixes
    from pyspark.sql import functions as F

    hostile = ".".join(str(i) for i in range(1000)) + ".example.com"
    rows = spark.range(1).select(
        host_suffixes(F.lit(hostile)).alias("s")).collect()
    s = rows[0]["s"]
    assert len(s) == LABEL_CAP
    assert s[-1] == "com" and s[-2] == "example.com"


def _filtered(spark, urls, blocked):
    from hickoryspark.ops.hosts import filter_blocklist

    pages = spark.createDataFrame([(u, "<p>x</p>") for u in urls],
                                  "url string, html string")
    bl = spark.createDataFrame([(b,) for b in blocked], "host string")
    return sorted(r["url"] for r in filter_blocklist(pages, bl).collect())


def test_blocklist_exact_and_subdomain(spark):
    urls = [
        "https://spam.example/a",
        "https://sub.spam.example/b",
        "https://notspam.example/c",      # suffix 'spam.example' is NOT
                                          # a dot-boundary match
        "https://ok.test/d",
        "relative/no-host",
    ]
    out = _filtered(spark, urls, ["spam.example"])
    assert out == ["https://notspam.example/c", "https://ok.test/d",
                   "relative/no-host"]


def test_blocklist_case_and_whitespace_folded(spark):
    out = _filtered(spark, ["https://Bad.Site/x", "https://good/y"],
                    ["  BAD.site "])
    assert out == ["https://good/y"]


def test_host_stats(spark):
    from hickoryspark.ops.hosts import host_stats

    pages = spark.createDataFrame(
        [("https://a/1", "xx"), ("https://a:80/2", "yyy"),
         ("noauth", "z")],
        "url string, html string",
    )
    rows = {r["host"]: r for r in host_stats(pages).collect()}
    assert rows["a"]["n_pages"] == 2 and rows["a"]["n_bytes"] == 5
    assert rows[None]["n_pages"] == 1


def test_blocklist_join_is_broadcast_and_corpus_unshuffled(spark):
    from hickoryspark.ops.hosts import filter_blocklist

    # the blocklist must actually hit a page: an empty hit set lets
    # AQE eliminate the anti-join entirely (also fine, but then no
    # join shape exists to assert on)
    pages = spark.createDataFrame(
        [("https://a/1", "x"), ("https://bad/2", "y")],
        "url string, html string",
    )
    bl = spark.createDataFrame([("bad",)], "host string")
    out = filter_blocklist(pages, bl)
    out.collect()
    # the hit set's size is only known at runtime: AQE must have
    # re-planned the anti-join as broadcast (same final-plan assertion
    # the dedup group guards use)
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    ).split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_blocklist_crlf_and_blank_entries(spark):
    # review fixes: a CRLF-read blocklist entry ('...\r') must still
    # match, and a blank line must block NOTHING
    out = _filtered(spark, ["https://bad.site/x", "https://ok.site/y"],
                    ["bad.site\r", "   ", ""])
    assert out == ["https://ok.site/y"]


def test_ipv6_and_multi_at_hosts(spark):
    # bracketed IPv6 literals keep their colons; userinfo strips to
    # the LAST '@' (WHATWG)
    assert _host(spark, "https://[2001:db8::1]/x") == "[2001:db8::1]"
    assert _host(spark, "https://[2001:DB8::1]:8080/x") == "[2001:db8::1]"
    assert _host(spark, "https://a@b@c.host/x") == "c.host"


def test_trailing_dot_fqdn_matches_blocklist(spark):
    # 'spam.example.' is the same DNS name — the trailing-dot spelling
    # must not evade the blocklist, and must aggregate with the
    # dotless host in host_stats
    from hickoryspark.ops.hosts import host_stats

    out = _filtered(spark, ["https://spam.example./x",
                            "https://ok.test/y"], ["spam.example"])
    assert out == ["https://ok.test/y"]
    pages = spark.createDataFrame(
        [("https://h.ex/1", "a"), ("https://h.ex./2", "bb")],
        "url string, html string")
    rows = {r["host"]: r["n_pages"] for r in host_stats(pages).collect()}
    assert rows == {"h.ex": 2}


def test_frontier_batches_politeness(spark):
    from hickoryspark.ops.hosts import frontier_batches

    urls = [f"https://h.ex/{i}" for i in range(10)] + [
        "https://solo.ex/a", "relative/x", "relative/y"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = [r.asDict() for r in frontier_batches(df, per_host=4).collect()]
    # no batch holds more than 4 urls of one host
    from collections import Counter

    per = Counter((r["host"], r["batch"]) for r in rows)
    assert max(per.values()) <= 4
    # h.ex: 10 urls -> batches 0,0,0,0,1,1,1,1,2,2 in url order
    h = sorted((r["url"], r["batch"]) for r in rows if r["host"] == "h.ex")
    assert [b for _, b in h] == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    # authority-less urls bucket under NULL host together
    assert {r["batch"] for r in rows if r["host"] is None} == {0}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        frontier_batches(df, per_host=0)


def test_url_host_matches_urlsplit_property(spark):
    """Hypothesis fuzz vs urllib.parse.urlsplit().hostname as an
    INDEPENDENT oracle over absolute http(s) urls: userinfo (multiple
    '@'), ports, uppercase, trailing dots, IPv6 brackets. Mapped
    divergences (both pinned in the op docstring): ours keeps IPv6
    brackets (urllib strips them) and strips ONE trailing dot
    (urllib keeps it). Unsafe \\t\\n\\r are NOT generated — url_host
    documents that urls arrive post-normalize_url, which strips them
    (urllib strips its own per bpo-43882, so injecting would grade a
    step this op deliberately doesn't own)."""
    from urllib.parse import urlsplit

    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from hickoryspark.ops.hosts import url_host

    label = st.text(alphabet="abcZ019-_", min_size=1, max_size=4)
    host = st.one_of(
        st.lists(label, min_size=1, max_size=3).map(".".join),
        st.lists(label, min_size=1, max_size=2).map(
            lambda ls: ".".join(ls) + "."),
        st.sampled_from(["[2001:DB8::1]", "[::1]", "[v1.fe:x]"]),
        st.just(""),
    )
    user = st.sampled_from(["", "u@", "a:p@", "x@y@"])
    port = st.sampled_from(["", ":80", ":8080", ":x"])
    path = st.sampled_from(["", "/", "/p?q#f", "/a:b@c"])
    url = st.builds(lambda u, h, pt, p: f"https://{u}{h}{pt}{p}",
                    user, host, port, path)

    cases = []

    @settings(max_examples=300, deadline=None)
    @given(url)
    def collect(u):
        cases.append((u,))

    collect()
    df = spark.createDataFrame(cases, "url string")
    got = df.select("url", url_host(F.col("url")).alias("h")).collect()
    for r in got:
        try:
            expect = urlsplit(r["url"]).hostname
        except ValueError:
            continue  # urllib rejects (bad ipv6) — ours is best-effort
        if expect is not None and ":" in expect:
            expect = "[" + expect + "]"   # ours keeps ipv6 brackets
        if expect is not None and expect.endswith("."):
            expect = expect[:-1] or None  # ours strips one trailing dot
        if expect == "":
            expect = None
        assert r["h"] == expect, (r["url"], r["h"], expect)


# ---------------------------------------------------------------------------
# subdomain_stats


def test_subdomain_explosion_flags(spark):
    from hickoryspark.ops.hosts import subdomain_stats

    rows = (
        # trap farm: every url a fresh host under trap.com
        [(f"https://r{i}.trap.com/p",) for i in range(12)]
        # healthy site: many urls, two hosts
        + [(f"https://www.ok.com/p{i}",) for i in range(10)]
        + [("https://ok.com/root",)]
        # public-suffix-only host folds out
        + [("https://com/x",)]
    )
    df = spark.createDataFrame(rows, "url string")
    out = {r["registered_domain"]: r for r in
           subdomain_stats(df, min_hosts=10).collect()}
    t = out["trap.com"]
    assert (t["n_hosts"], t["n_urls"], t["host_ratio_milli"],
            t["explosion"]) == (12, 12, 1000, True)
    ok = out["ok.com"]
    assert ok["n_hosts"] == 2 and ok["explosion"] is False
    assert ok["max_labels"] == 3  # www.ok.com
    assert set(out) == {"trap.com", "ok.com"}
