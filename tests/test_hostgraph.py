"""Host-graph rollup (ops/hostgraph.py): host folding, weighting,
intra/inter split, top-external tie rule, hostless-edge drops."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-hostgraph-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


EDGES = [
    ("https://a.ex/1", "https://a.ex/2"),      # intra
    ("https://a.ex/1", "https://B.EX./x"),     # case+dot fold -> b.ex
    ("https://a.ex/2", "https://b.ex/y"),
    ("https://a.ex/2", "https://c.ex/z"),
    ("https://a.ex/3", "/relative"),           # hostless dst: dropped
    ("rel/source", "https://a.ex/"),           # hostless src: dropped
    ("https://b.ex/1", "https://b.ex/2"),      # only-intra host
]


def _frames(spark):
    from hickoryspark.ops.hostgraph import host_edges, host_link_stats

    df = spark.createDataFrame(EDGES, "url string, resolved string")
    e = {(r["src_host"], r["dst_host"]): r["n_links"]
         for r in host_edges(df).collect()}
    s = {r["src_host"]: (r["n_edges"], r["n_intra"], r["n_inter"],
                         r["n_hosts"], r["top_external"])
         for r in host_link_stats(df).collect()}
    return e, s


def test_host_edges_fold_and_weight(spark):
    e, _ = _frames(spark)
    assert e == {
        ("a.ex", "a.ex"): 1,
        ("a.ex", "b.ex"): 2,
        ("a.ex", "c.ex"): 1,
        ("b.ex", "b.ex"): 1,
    }


def test_stats_split_and_top_external(spark):
    _, s = _frames(spark)
    assert s["a.ex"] == (4, 1, 3, 3, "b.ex")
    assert s["b.ex"] == (1, 1, 0, 1, None)


def test_top_external_tie_is_host_ascending(spark):
    from hickoryspark.ops.hostgraph import host_link_stats

    df = spark.createDataFrame(
        [("https://s.ex/", "https://z.ex/"),
         ("https://s.ex/", "https://m.ex/")],
        "url string, resolved string")
    row = host_link_stats(df).collect()[0]
    assert row["top_external"] == "m.ex"


def test_mirror_agrees(spark):
    import duckdb

    from hickoryspark.ops.hostgraph import duckdb_host_edges_sql

    e, _ = _frames(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE links(url VARCHAR, resolved VARCHAR)")
    con.executemany("INSERT INTO links VALUES (?, ?)", EDGES)
    want = {(a, b): n for a, b, n in con.execute(
        duckdb_host_edges_sql("links")).fetchall()}
    assert e == want


def test_category_mix_exact_shares(spark):
    from hickoryspark.ops.hostgraph import category_mix

    rows = spark.createDataFrame(
        [("a.ex", "en"), ("a.ex", "en"), ("a.ex", "de"),
         ("b.ex", None), ("b.ex", "en")],
        "host string, lang_pred string")
    out = {(r["host"], r["lang_pred"]): (r["n_docs"], r["share_milli"])
           for r in category_mix(rows).collect()}
    assert out[("a.ex", "en")] == (2, 666)
    assert out[("a.ex", "de")] == (1, 333)
    assert out[("b.ex", None)] == (1, 500)
    assert out[("b.ex", "en")] == (1, 500)


def test_host_link_quality_shares(spark):
    from hickoryspark.ops.hostgraph import host_link_quality

    links = spark.createDataFrame(
        [("https://a.ex/1", "https://a.ex/2", False),
         ("https://a.ex/1", "https://b.ex/x", True),
         ("https://a.ex/2", "https://c.ex/y", None),
         ("https://a.ex/3", "/relative", True),     # dropped
         ("https://b.ex/1", "https://b.ex/2", True)],
        "url string, resolved string, rel_nofollow boolean")
    out = {r["src_host"]: (r["n_edges"], r["nofollow_milli"],
                           r["external_milli"])
           for r in host_link_quality(links).collect()}
    assert out["a.ex"] == (3, 333, 666)
    assert out["b.ex"] == (1, 1000, 0)


def test_category_mix_keeps_null_key_bucket(spark):
    # review regression: the totals join must be null-safe — NULL
    # keys (hostless urls) are a real bucket and a plain equi-join
    # silently dropped them
    from hickoryspark.ops.hostgraph import category_mix

    rows = spark.createDataFrame(
        [(None, "en"), (None, "en"), (None, "de"), ("a.ex", "en")],
        "host string, lang_pred string")
    out = {(r["host"], r["lang_pred"]): (r["n_docs"], r["share_milli"])
           for r in category_mix(rows).collect()}
    assert out[(None, "en")] == (2, 666)
    assert out[(None, "de")] == (1, 333)
    assert out[("a.ex", "en")] == (1, 1000)


# ---------------------------------------------------------------------------
# degree_histogram


def test_degree_histogram_buckets_and_distinct_rule(spark):
    from hickoryspark.ops.hostgraph import degree_histogram

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("a", "b"),          # duplicate counts once
            ("a", "c"), ("a", "d"),          # a: out-degree 3 -> bucket 2
            ("e", "a"),                      # e: out 1 -> bucket 1
        ],
        "src_host string, dst_host string",
    )
    out = {(r["direction"], r["bucket"]): r["n_nodes"]
           for r in degree_histogram(edges).collect()}
    # out: a=3 (bucket 2), e=1 (bucket 1)
    assert out[("out", 2)] == 1 and out[("out", 1)] == 1
    # in: b=1, c=1, d=1, a=1 -> four nodes in bucket 1
    assert out[("in", 1)] == 4
    assert sum(n for (d, _), n in out.items() if d == "in") == 4
