"""Link-graph extraction (ops/links.py): resolution cases, document
order, direct-text anchor semantics."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-links-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _links(spark, html, url="https://ex.test/a/b"):
    from hickoryspark.ops.links import extract_links
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    rows = extract_links(explode_nodes(pages)).collect()
    return sorted(rows, key=lambda r: r["link_pos"])


def test_resolution_absolute_host_relative_path_relative(spark):
    rows = _links(
        spark,
        '<a href="https://other.example/x">abs</a>'
        '<a href="/root">hostrel</a>'
        '<a href="sib.html">pathrel</a>'
        '<a href="mailto:x@y.z">mail</a>',
    )
    assert [(r["href"], r["resolved"]) for r in rows] == [
        ("https://other.example/x", "https://other.example/x"),
        ("/root", "https://ex.test/root"),
        ("sib.html", "https://ex.test/a/sib.html"),
        ("mailto:x@y.z", "mailto:x@y.z"),  # scheme-qualified: kept
    ]
    assert [r["link_pos"] for r in rows] == [1, 2, 3, 4]


def test_anchor_text_is_direct_text_only_in_document_order(spark):
    rows = _links(
        spark,
        '<a href="/1">one <b>bold</b> two</a>'
        '<a href="/2"><i>all nested</i></a>'
        '<a href="/3"></a>',
    )
    # direct strings concatenated in order; nested element text excluded
    assert [r["anchor_text"] for r in rows] == ["one  two", "", ""]


def test_anchors_without_href_are_skipped(spark):
    rows = _links(spark, '<a name="top">x</a><a href="/y">y</a>')
    assert [(r["link_pos"], r["href"]) for r in rows] == [(1, "/y")]


def test_protocol_relative_and_query_fragment_refs(spark):
    # review repros: RFC 3986 network-path / query-only / fragment-only
    # references, and a '/' inside the page query must not become the
    # base truncation point
    rows = _links(
        spark,
        '<a href="//cdn.example/x">p</a>'
        '<a href="rel.html">r</a>'
        '<a href="#frag">f</a>'
        '<a href="?q=1">q</a>',
        url="https://ex.test/a/b?x=/deep/y",
    )
    assert [r["resolved"] for r in rows] == [
        "https://cdn.example/x",
        "https://ex.test/a/rel.html",
        "https://ex.test/a/b?x=/deep/y#frag",
        "https://ex.test/a/b?q=1",
    ]


def test_empty_href_is_same_document_reference(spark):
    # review repro: '<a href="">' resolves to the page url verbatim
    # (CPython urljoin's empty-ref early-exit), not the base directory
    rows = _links(spark, '<a href="">self</a>',
                  url="https://ex.test/a/b?k=v")
    assert [r["resolved"] for r in rows] == ["https://ex.test/a/b?k=v"]


def test_origin_only_page_url_and_scheme_case(spark):
    # review repro: an origin-only page url must not lose its host to
    # the truncate-to-last-slash base, and uppercase schemes are
    # absolute too
    rows = _links(
        spark,
        '<a href="news.html">n</a><a href="HTTPS://other.site/x">o</a>',
        url="https://ex.test",
    )
    assert [r["resolved"] for r in rows] == [
        "https://ex.test/news.html",
        "HTTPS://other.site/x",
    ]


def test_resolve_href_matches_urljoin_property():
    """Hypothesis fuzz against urllib.parse.urljoin as an INDEPENDENT
    oracle, over the reference classes resolve_href implements —
    dot-segments INCLUDED ('.', '..', 'a.' segments generate freely),
    so urljoin grades the RFC 3986 §5.2.4 fold too; ASCII tab/newline
    injected into both sides, so urljoin also grades the WHATWG
    unsafe-byte strip (injection into NONEMPTY strings only: a bare
    '#'/'?' href is a known CPython-vs-RFC divergence out of scope)."""
    from urllib.parse import urljoin

    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from hickoryspark.ops.links import resolve_href
    from hickoryspark.spark.session import get_spark

    spark = get_spark(4, shuffle_partitions=4)

    seg = st.text(alphabet="abcz019-_.", min_size=1, max_size=5)
    path = st.lists(seg, min_size=0, max_size=4).map(
        lambda segs: "/" + "/".join(segs) if segs else ""
    )
    page = st.builds(
        lambda host, p, q: f"https://{host}{p}" + (f"?k={q}" if q else ""),
        st.sampled_from(["ex.test", "a.b.test"]), path,
        st.sampled_from(["", "v", "x/y"]),
    )
    href = st.one_of(
        st.builds(lambda p: f"https://other.site{p}", path),
        st.builds(lambda h, p: f"//{h}{p}", st.sampled_from(["cdn.x"]), path),
        path.filter(bool),
        st.builds(lambda s: s, seg),
        st.builds(lambda s: "#" + s, seg),
        st.builds(lambda s: "?" + s, seg),
        st.just(""),
    )

    def _inject(s, c, i):
        # insert one unsafe char at position i (mod len+1); '' = none
        return s[: i % (len(s) + 1)] + c + s[i % (len(s) + 1):] if s else s

    unsafe = st.sampled_from(["", "\t", "\n", "\r"])
    pos = st.integers(min_value=0, max_value=24)
    page = st.builds(_inject, page, unsafe, pos)
    href = st.builds(_inject, href, unsafe, pos)

    cases = []

    @settings(max_examples=200, deadline=None)
    @given(page, href)
    def collect(u, h):
        cases.append((u, h))

    collect()
    df = spark.createDataFrame(cases, "url string, href string")
    got = df.select(
        "url", "href", resolve_href(F.col("url"), F.col("href")).alias("r")
    ).collect()
    for r in got:
        expect = urljoin(r["url"], r["href"])
        assert r["r"] == expect, (r["url"], r["href"], r["r"], expect)


def test_subtree_text_mode_includes_nested_markup(spark):
    # verdict item 4: '<a href=x><b>Click</b></a>' yields '' in direct
    # mode but 'Click' with subtree_text=True; interleaved direct and
    # nested text concatenates in document order
    from hickoryspark.ops.links import extract_links
    from hickoryspark.spark.nodes_table import explode_nodes

    html = (
        '<a href="/1">one <b>bold</b> two</a>'
        '<a href="/2"><i>all <em>nested</em></i></a>'
        '<a href="/3"></a>'
    )
    pages = spark.createDataFrame(
        [("https://ex.test/a/b", html)], "url string, html string"
    )
    nodes = explode_nodes(pages)
    direct = {r["link_pos"]: r["anchor_text"]
              for r in extract_links(nodes).collect()}
    sub = {r["link_pos"]: r["anchor_text"]
           for r in extract_links(nodes, subtree_text=True).collect()}
    assert direct == {1: "one  two", 2: "", 3: ""}
    assert sub == {1: "one bold two", 2: "all nested", 3: ""}


def test_dot_segment_hrefs_resolve_folded(spark):
    # the round-5 template classes: path-relative '../' and
    # host-relative '/x/../' fold; netloc refs stay as written
    rows = _links(
        spark,
        '<a href="../up">u</a>'
        '<a href="/x/../about">a</a>'
        '<a href="sub/../sib.html">s</a>'
        '<a href="https://o.site/a/../b">n</a>',
        url="https://ex.test/src/42",
    )
    assert [r["resolved"] for r in rows] == [
        "https://ex.test/up",
        "https://ex.test/about",
        "https://ex.test/src/sib.html",
        "https://o.site/a/../b",
    ]


def test_rel_nofollow_token_matching(spark):
    rows = _links(
        spark,
        '<a href="/a">p</a>'
        '<a href="/b" rel="nofollow">q</a>'
        '<a href="/c" rel="external\tNOFOLLOW x">r</a>'
        '<a href="/d" rel="nofollower">s</a>',
    )
    assert [(r["href"], r["rel_nofollow"]) for r in rows] == [
        ("/a", False), ("/b", True), ("/c", True), ("/d", False),
    ]


def test_aggregate_anchors_counts_and_distinct_pages(spark):
    from pyspark.sql import Row

    from hickoryspark.ops.links import aggregate_anchors

    edges = spark.createDataFrame([
        Row(url="https://a/1", resolved="https://t/x", anchor_text="one"),
        Row(url="https://a/1", resolved="https://t/x", anchor_text="one"),
        Row(url="https://a/2", resolved="https://t/x", anchor_text="uno"),
        Row(url="https://a/2", resolved="https://t/y", anchor_text="why"),
    ])
    out = {r["target"]: r for r in aggregate_anchors(edges).collect()}
    x = out["https://t/x"]
    assert x["n_links"] == 3       # total edges
    assert x["n_pages"] == 2       # distinct referring urls
    assert x["anchors"] == "one|uno"  # distinct, lexicographic
    y = out["https://t/y"]
    assert (y["n_links"], y["n_pages"], y["anchors"]) == (1, 1, "why")


def test_aggregate_anchors_cap_keeps_lexicographic_head(spark):
    from pyspark.sql import Row

    from hickoryspark.ops.links import aggregate_anchors

    edges = spark.createDataFrame([
        Row(url=f"https://a/{i}", resolved="https://t/x",
            anchor_text=f"t{i:02d}")
        for i in range(10)
    ])
    capped = aggregate_anchors(edges, anchor_cap=3).collect()[0]
    assert capped["anchors"] == "t00|t01|t02"
    assert capped["n_links"] == 10 and capped["n_pages"] == 10
    exact = aggregate_anchors(edges, anchor_cap=None).collect()[0]
    assert exact["anchors"] == "|".join(f"t{i:02d}" for i in range(10))


def test_link_domains_profile(spark):
    from hickoryspark.ops.links import link_domains

    edges = spark.createDataFrame(
        [("https://sub.a.ex/p", "https://sub2.a.ex/x", False),
         ("https://sub.a.ex/p", "https://a.ex/y", False),
         ("https://sub.a.ex/p", "https://b.ex/z", False),
         ("https://sub.a.ex/p", "https://c.co.uk/w", False),
         ("https://sub.a.ex/p", "mailto:x@y", False),
         ("https://nohost/p", "https://a.ex/q", False)],
        "url string, resolved string, rel_nofollow boolean",
    )
    rows = {r["url"]: r for r in link_domains(
        edges, psl_rules=["ex", "co.uk"]).collect()}
    p = rows["https://sub.a.ex/p"]
    # sub2.a.ex and apex a.ex both fold to registered domain a.ex ->
    # internal (2 edges); b.ex, c.co.uk external; mailto has no host
    # -> external with NULL domain
    assert (p["n_links"], p["n_internal"], p["n_external"]) == (5, 2, 3)
    assert p["n_domains"] == 3  # a.ex, b.ex, c.co.uk
    n = rows["https://nohost/p"]
    # page url with unresolvable registered domain: everything external
    assert (n["n_internal"], n["n_external"]) == (0, 1)


def test_link_domains_one_shuffle_no_window(spark):
    from hickoryspark.ops.links import link_domains

    edges = spark.createDataFrame(
        [("https://a.ex/p", "https://b.ex/x", False)],
        "url string, resolved string, rel_nofollow boolean",
    )
    df = link_domains(edges, psl_rules=["ex"])
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Join" not in plan


class TestAnchorTextProfile:
    def test_profile_counts_ties_and_empty(self, spark):
        from hickoryspark.ops.links import anchor_text_profile

        rows = [
            # target T1: 'home' x2, 'start' x2 (tie -> 'home'), one empty
            ("https://s/a", 1, "x", "T1", "home", False),
            ("https://s/a", 2, "x", "T1", "start", False),
            ("https://s/b", 1, "x", "T1", "home", False),
            ("https://s/b", 2, "x", "T1", "start", False),
            ("https://s/b", 3, "x", "T1", "", False),
            # target T2: all empty anchors
            ("https://s/a", 3, "x", "T2", "", False),
            ("https://s/c", 1, "x", "T2", "", True),
        ]
        links = spark.createDataFrame(
            rows, "url string, link_pos long, href string, "
                  "resolved string, anchor_text string, "
                  "rel_nofollow boolean")
        got = {r["target"]: r.asDict()
               for r in anchor_text_profile(links).collect()}
        t1 = got["T1"]
        assert (t1["n_links"], t1["n_source_pages"], t1["n_anchors"]) == (5, 2, 2)
        assert (t1["top_anchor"], t1["top_count"]) == ("home", 2)
        t2 = got["T2"]
        assert (t2["n_links"], t2["n_source_pages"], t2["n_anchors"]) == (2, 2, 0)
        assert t2["top_anchor"] is None and t2["top_count"] == 0

    def test_profile_duckdb_mirror(self, spark):
        import duckdb

        from hickoryspark.ops.links import anchor_text_profile

        rows = [(f"https://s/{i % 7}", i, "h", f"T{i % 3}",
                 ["go", "here", "", "link"][i % 4], False)
                for i in range(40)]
        links = spark.createDataFrame(
            rows, "url string, link_pos long, href string, "
                  "resolved string, anchor_text string, "
                  "rel_nofollow boolean")
        got = sorted(tuple(r) for r in anchor_text_profile(links).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE l (url VARCHAR, link_pos BIGINT, "
                    "href VARCHAR, resolved VARCHAR, anchor_text VARCHAR, "
                    "rel_nofollow BOOLEAN)")
        con.executemany("INSERT INTO l VALUES (?, ?, ?, ?, ?, ?)", rows)
        want = sorted(tuple(r) for r in con.execute("""
            WITH totals AS (
              SELECT resolved AS target,
                     CAST(COUNT(*) AS BIGINT) AS n_links,
                     CAST(COUNT(DISTINCT url) AS BIGINT) AS n_source_pages
              FROM l GROUP BY resolved),
            pa AS (
              SELECT resolved AS target, anchor_text,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM l WHERE anchor_text <> ''
              GROUP BY resolved, anchor_text),
            tops AS (
              SELECT target, CAST(COUNT(*) AS BIGINT) AS n_anchors,
                     min({'nc': -cnt, 'a': anchor_text}).a AS top_anchor,
                     CAST(-min({'nc': -cnt, 'a': anchor_text}).nc AS BIGINT)
                         AS top_count
              FROM pa GROUP BY target)
            SELECT t.target, t.n_links, t.n_source_pages,
                   CAST(COALESCE(p.n_anchors, 0) AS BIGINT) AS n_anchors,
                   p.top_anchor,
                   CAST(COALESCE(p.top_count, 0) AS BIGINT) AS top_count
            FROM totals t LEFT JOIN tops p USING (target)
        """).fetchall())
        assert got == want


def _blinks(spark, html, url="https://ex.test/a/b", honor_base=True):
    from hickoryspark.ops.links import extract_links
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame([(url, html)], "url string, html string")
    rows = extract_links(explode_nodes(pages), honor_base=honor_base)
    return [r["resolved"] for r in
            sorted(rows.collect(), key=lambda r: r["link_pos"])]


def test_base_href_absolute_and_dot_fold(spark):
    assert _blinks(
        spark,
        '<base href="https://cdn.ex/assets/">'
        '<a href="x/../img.png">t</a><a href="/root">r</a>') == [
        "https://cdn.ex/assets/img.png", "https://cdn.ex/root"]


def test_base_href_relative_composes_with_page_url(spark):
    assert _blinks(
        spark, '<base href="sub/"><a href="q">t</a>') == [
        "https://ex.test/a/sub/q"]


def test_base_first_wins_and_default_off(spark):
    html = '<base href="/one/"><base href="/two/"><a href="f">t</a>'
    assert _blinks(spark, html) == ["https://ex.test/one/f"]
    # default honor_base=False keeps page-url resolution
    assert _blinks(spark, html, honor_base=False) == [
        "https://ex.test/a/f"]


def test_base_absent_falls_back_to_page_url(spark):
    assert _blinks(spark, '<a href="f">t</a>') == ["https://ex.test/a/f"]


def test_resolve_href_stage_compiles_whole_stage_codegen(spark):
    """r6 optimization guard (r5 verdict #2): stages composing
    resolve_href must never die or silently degrade under
    codegen.fallback=false (which turns a janino method-size overflow
    into a hard error). The guarded shape evolved within r6: first the
    dot-segment fold ran once/eagerly at expression top level so the
    generated method fit the 64 KB budget; now the whole body is
    LET-BOUND (ops/urls.let_ — higher-order functions are
    CodegenFallback, so the regex program is evaluated by the lazy
    interpreter and never emitted into a janino method at all). Either
    way this test must pass: no codegen error, reference values."""
    from pyspark.sql import functions as F

    from hickoryspark.ops.links import resolve_href
    from hickoryspark.ops.urls import normalize_url

    df = spark.createDataFrame(
        [
            ("https://ex.test/a/b/page?q=1#f", "../x/../y"),
            ("https://ex.test", "/p/../q"),
            ("https://ex.test/a/", "//cdn/z"),
            ("https://ex.test/a/", ""),
        ],
        "url string, href string",
    )
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        # resolve alone AND the canonical_targets-style composition
        # normalize∘resolve — both must compile
        out = df.select(
            resolve_href(F.col("url"), F.col("href")).alias("r"),
            normalize_url(
                resolve_href(F.col("url"), F.col("href"))
            ).alias("n"),
        ).collect()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)
    assert [r["r"] for r in out] == [
        "https://ex.test/a/y",
        "https://ex.test/q",
        "https://cdn/z",
        "https://ex.test/a/",
    ]


def test_normalize_resolve_composition_plan_stays_bounded(spark):
    """let-binding regression guard (r6): composing
    normalize_url(resolve_href(...)) INLINE once spliced the ~33 KB
    resolve tree into every argument reference of normalize — a
    2.58 MB optimized plan carrying 49,895 regexp_replace nodes,
    evaluated per row (hreflang_symmetry ran 36-44s over 5000 docs).
    With both builders let-bound the plan must stay small; this pins
    the property so a future refactor that drops a let_ fails here
    instead of in a 10x gate slowdown."""
    from pyspark.sql import functions as F

    from hickoryspark.ops.links import resolve_href
    from hickoryspark.ops.urls import normalize_url

    df = spark.createDataFrame(
        [("https://ex.test/a/b/", "../x")], "url string, href string"
    )
    comp = df.select(
        normalize_url(resolve_href(F.col("url"), F.col("href"))).alias("n")
    )
    plan = comp._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 200_000, f"plan blew up to {len(plan)} chars"
    assert plan.count("regexp_replace") < 2000, plan.count("regexp_replace")
