"""URL canonicalization: Spark pipeline vs the DuckDB mirror on edge
cases, plus the groupBy dedup pass."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = [
    ("HTTPS://EX.Test/src/42", "https://ex.test/src/42"),
    ("https://ex.test:443/src/42/", "https://ex.test/src/42"),
    ("http://ex.test:80/a?utm_source=x&id=7&utm_campaign=y",
     "http://ex.test/a?id=7"),
    ("https://ex.test/a?utm_source=x", "https://ex.test/a"),
    ("https://ex.test/a#frag", "https://ex.test/a"),
    ("https://ex.test/", "https://ex.test"),
    ("https://ex.test/a/b/?gclid=123#x", "https://ex.test/a/b"),
    ("https://ex.test/a?id=7&fbclid=zz", "https://ex.test/a?id=7"),
    # non-default port and path colons survive untouched
    ("https://ex.test:8080/keep:port", "https://ex.test:8080/keep:port"),
    ("https://ex.test/a?id=7", "https://ex.test/a?id=7"),
    # LOOKALIKE params and path segments must survive: the tracking
    # pattern is anchored at a ?/& separator
    ("https://ex.test/a?msgclid=5&b=2", "https://ex.test/a?msgclid=5&b=2"),
    ("https://ex.test/utm_source=x/page", "https://ex.test/utm_source=x/page"),
    ("https://ex.test/a?xutm_b=1", "https://ex.test/a?xutm_b=1"),
    # consecutive tracking params all drop in one pass
    ("https://ex.test/a?utm_a=1&utm_b=2", "https://ex.test/a"),
    ("https://ex.test/a?utm_a=1&utm_b=2&id=3", "https://ex.test/a?id=3"),
    ("https://ex.test/a?id=1&utm_a=2&gclid=3", "https://ex.test/a?id=1"),
    # RFC 3986 §5.2.4 dot-segment removal (verdict item: '../' is
    # everywhere on the real web and must fold to one canonical form)
    ("https://ex.test/a/../b", "https://ex.test/b"),
    ("https://ex.test/a/./b/", "https://ex.test/a/b"),
    ("https://ex.test/../a", "https://ex.test/a"),
    ("https://ex.test/../../a", "https://ex.test/a"),
    ("https://ex.test/a/b/../../c", "https://ex.test/c"),
    ("https://ex.test/a/b/c/../../../d/../e", "https://ex.test/e"),
    ("https://ex.test/a/..", "https://ex.test"),
    ("https://ex.test/a/.", "https://ex.test/a"),
    ("https://ex.test/a//../b", "https://ex.test/a/b"),
    # the query/fragment are DATA: a '/../' there must not fold, and
    # dot-LOOKALIKE segments ('..a', 'a..', '...') are real segments
    ("https://ex.test/a/../b?x=/c/../d", "https://ex.test/b?x=/c/../d"),
    ("https://ex.test/..a/b../.../x", "https://ex.test/..a/b../.../x"),
    # authority protected: the '//' of '://' is not a fold anchor
    ("https://h/../a", "https://h/a"),
    # WHATWG preprocessing: ASCII tab/newline/CR stripped ANYWHERE
    # before parsing (review repro: raw '\n' in an href used to split
    # the query differently in Java regex vs RE2)
    ("https://ex.test/a\t/../b#f\nrag", "https://ex.test/b"),
    ("https://ex.test/p?a/../b\n", "https://ex.test/p?a/../b"),
    ("https://ex.test:44\r3/x", "https://ex.test/x"),
    ("ht\ntps://ex.test/a/..", "https://ex.test"),
]


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(2, app_name="hickoryspark-url-tests", shuffle_partitions=2)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_normalize_matches_expected_and_duckdb(spark):
    import duckdb

    from hickoryspark.ops.urls import duckdb_normalize_sql, normalize_url

    df = spark.createDataFrame([(c,) for c, _ in CASES], "url string")
    got = [r[0] for r in df.select(normalize_url("url")).collect()]
    con = duckdb.connect()
    sql = duckdb_normalize_sql("url")
    for (case, expected), g in zip(CASES, got):
        assert g == expected, case
        o = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS url)", [case]
        ).fetchone()[0]
        assert o == expected, case


def test_url_dedup_groups(spark):
    from hickoryspark.ops.urls import url_dedup_groups

    variants = [
        "https://ex.test/a",
        "HTTPS://EX.TEST/a",
        "https://ex.test:443/a",
        "https://ex.test/a#x",
        "https://ex.test/b",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    groups = {r["url_norm"]: (r["n_variants"], r["first_url"])
              for r in url_dedup_groups(df).collect()}
    assert groups["https://ex.test/a"] == (4, "HTTPS://EX.TEST/a")
    assert groups["https://ex.test/b"] == (1, "https://ex.test/b")


def test_normalize_is_idempotent_on_fuzzed_urls(spark):
    """normalize(normalize(u)) == normalize(u): canonical forms are
    fixpoints, across random compositions of the mess the pipeline
    claims to fold."""
    import random

    from hickoryspark.ops.urls import normalize_url
    from pyspark.sql import functions as F

    rng = random.Random(20260816)
    urls = []
    for i in range(200):
        scheme = rng.choice(["http", "https", "HTTPS", "Http"])
        host = rng.choice(["ex.test", "EX.Test", "a.b.test"])
        port = rng.choice(["", ":443", ":80", ":8080"])
        path = rng.choice(["", "/", f"/p{i}", f"/p{i}/", f"/a/b{i}",
                           f"/a/../b{i}", "/./x", f"/p{i}/.."])
        q = rng.choice(["", "?id=1", "?utm_source=x", "?utm_source=x&id=2",
                        "?id=3&utm_campaign=y&z=4"])
        frag = rng.choice(["", "#f", "#sec2"])
        urls.append(f"{scheme}://{host}{port}{path}{q}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(normalize_url("url").alias("n1"))
    twice = once.select(F.col("n1"), normalize_url("n1").alias("n2"))
    bad = twice.where(F.col("n1") != F.col("n2")).collect()
    assert not bad, bad[:5]


def test_remove_dot_segments_matches_urljoin_fold(spark):
    """remove_dot_segments vs urllib.parse.urljoin's host-relative
    fold (an INDEPENDENT RFC 3986 implementation) over random
    dot-heavy absolute paths, incl. empty segments and lookalikes."""
    import random
    from urllib.parse import urljoin

    from hickoryspark.ops.urls import remove_dot_segments

    rng = random.Random(20260817)
    paths = []
    for _ in range(300):
        segs = [
            rng.choice(["a", "b9", ".", "..", "...", "a.", ".a", ""])
            for _ in range(rng.randint(0, 6))
        ]
        paths.append("/" + "/".join(segs))
    df = spark.createDataFrame(
        [("https://h.test" + p, p) for p in paths], "url string, p string"
    )
    rows = df.select("p", remove_dot_segments("url").alias("f")).collect()
    for r in rows:
        if r["p"].startswith("//"):
            # urljoin parses a '//'-leading string as a network-path
            # REFERENCE (empty netloc), not a path — out of scope here
            continue
        assert r["f"] == urljoin("https://h.test/", r["p"]), r["p"]


def test_remove_dot_segments_duckdb_mirror_agrees(spark):
    """The DuckDB mirror runs the identical pass program — byte-equal
    output on dot-heavy inputs including query/fragment tails."""
    import duckdb

    from hickoryspark.ops.urls import (
        duckdb_remove_dot_segments_sql,
        remove_dot_segments,
    )

    urls = [
        "https://h.test/a/../b",
        "https://h.test/../../x",
        "https://h.test/a/./b/c/../d?q=/e/../f#g/../h",
        "https://h.test/a//../b",
        "https://h.test/..a/.../b..",
        "https://h.test",
        "https://h.test/a/b/..",
        "HTTPS://H.test/A/../B",
        # remove_dot_segments itself does NOT strip unsafe chars (its
        # normalize_url caller does) — so on newline-bearing input the
        # two dialects must still split and fold identically (review
        # repros: Java '$' matches before a final '\n', RE2's doesn't;
        # '.' stops at '\n' in both)
        "https://h.test/p?a/../b\n",
        "https://h.test/p?q=/a/../b\nz",
        "https://h.test/a/..\n",
        "https://h.test/a/../b\nc#f\ng",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["f"]
           for r in df.select("url", remove_dot_segments("url").alias("f")).collect()}
    con = duckdb.connect()
    sql = duckdb_remove_dot_segments_sql("url")
    for u in urls:
        o = con.execute(f"SELECT {sql} FROM (SELECT ? AS url)", [u]).fetchone()[0]
        assert o == got[u], (u, o, got[u])


def test_url_features_cases(spark):
    from hickoryspark.ops.urls import url_features

    cases = [
        "https://Ex.Test/a/b/c.HTML?x=1&y=2&",
        "https://ex.test/",
        "https://ex.test",
        "http://ex.test/dir/file.tar.gz#frag",
        "http://ex.test/p?#f",
        "relative/only",
        "https://ex.test/a//b/",
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r.asDict() for r in url_features(df).collect()}
    r = got[cases[0]]
    assert (r["host"], r["path"], r["path_depth"], r["ext"],
            r["n_params"], r["is_root"]) == (
        "ex.test", "/a/b/c.HTML", 3, "html", 2, False)
    assert got[cases[1]]["is_root"] and got[cases[1]]["path_depth"] == 0
    assert got[cases[2]]["is_root"] and got[cases[2]]["path"] == ""
    assert got[cases[3]]["ext"] == "gz" and got[cases[3]]["n_params"] == 0
    assert got[cases[4]]["n_params"] == 0
    assert got[cases[5]]["host"] is None and got[cases[5]]["path"] == ""
    assert got[cases[6]]["path_depth"] == 2 and got[cases[6]]["ext"] is None


def test_url_features_duckdb_mirror(spark):
    import duckdb

    from hickoryspark.ops.urls import duckdb_url_features_sql, url_features

    cases = [
        "https://Ex.Test/a/b/c.HTML?x=1&y=2&",
        "https://ex.test/",
        "http://u:p@ex.test:8080/f.jpeg?a;b",
        "relative/only",
        "https://ex.test/a//b.verylongext9",
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    want = {
        r["url"]: (r["host"], r["path"], r["path_depth"], r["ext"],
                   r["n_params"], r["is_root"], r["url_len"])
        for r in url_features(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in cases])
    sql = f"SELECT url, {duckdb_url_features_sql('url')} FROM t"
    for row in con.execute(sql).fetchall():
        assert want[row[0]] == tuple(row[1:]), row


def test_url_features_overwrites_existing_columns(spark):
    # a frontier frame usually already carries a host (ops/hosts) —
    # the feature columns must REPLACE same-named inputs, never
    # produce a duplicate name that breaks every later F.col('host')
    from hickoryspark.ops.urls import url_features

    df = spark.createDataFrame(
        [("https://Ex.Test/a/b", "stale-host", 99)],
        "url string, host string, path_depth long")
    out = url_features(df)
    assert out.columns.count("host") == 1
    assert out.columns.count("path_depth") == 1
    row = out.select("host", "path_depth").collect()[0]
    assert row["host"] == "ex.test"
    assert row["path_depth"] == 2


# ---------------------------------------------------------------------------
# query_param_stats


def test_query_param_stats_parse_rules(spark):
    from hickoryspark.ops.urls import query_param_stats

    urls = spark.createDataFrame(
        [
            ("https://s.ex/a?id=1&id=2&flag",),
            ("https://s.ex/b?id=1&a=&x=1#id=9",),   # fragment excluded
            ("https://s.ex/c",),                     # no query
            ("https://s.ex/d?&&id=1",),              # empty pairs drop
            ("https://s.ex/e?k=v=w",),               # first '=' splits
        ],
        "url string",
    )
    out = {r["param"]: (r["n_occurrences"], r["n_distinct_values"],
                        r["n_flags"])
           for r in query_param_stats(urls).collect()}
    assert out["id"] == (4, 2, 0)     # values 1,2,1,1
    assert out["flag"] == (1, 0, 1)   # flag: no value
    assert out["a"] == (1, 1, 0)      # empty string IS a value
    assert out["x"] == (1, 1, 0)
    assert out["k"] == (1, 1, 0)      # value 'v=w'
    assert set(out) == {"id", "flag", "a", "x", "k"}


def test_query_param_stats_fragment_question_mark(spark):
    # RFC 3986: a '?' inside the fragment is fragment content, not a
    # query (review finding) — SPA route urls must yield no params
    from hickoryspark.ops.urls import query_param_stats

    urls = spark.createDataFrame(
        [("https://s.ex/app#/route?tab=1",),
         ("https://s.ex/a?x=1#/r?y=2",)],
        "url string",
    )
    out = {r["param"] for r in query_param_stats(urls).collect()}
    assert out == {"x"}
