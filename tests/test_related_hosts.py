"""Related hosts / bibliographic coupling
(ops/hostgraph.related_hosts): shared-target pairs, dice shares,
target cap, min_shared threshold, mirror agreement."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.hostgraph import duckdb_related_sql  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-rel-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _edges(host, targets):
    return [(f"https://{host}/p{i}", f"https://{t}/x")
            for i, t in enumerate(targets)]


def _run(spark, edges, **kw):
    from hickoryspark.ops.hostgraph import related_hosts

    df = spark.createDataFrame(edges, "url string, resolved string")
    return sorted(tuple(r) for r in related_hosts(df, **kw).collect())


def _duck(edges, **kw):
    con = duckdb.connect()
    con.execute("CREATE TABLE links (url VARCHAR, resolved VARCHAR)")
    con.executemany("INSERT INTO links VALUES (?, ?)", edges)
    return sorted(tuple(r) for r in
                  con.execute(duckdb_related_sql("links", **kw)).fetchall())


BASE = (
    _edges("a.ex", ["t1.ex", "t2.ex", "t3.ex"])
    + _edges("b.ex", ["t1.ex", "t2.ex", "t4.ex"])      # shares t1,t2
    + _edges("c.ex", ["t1.ex"])                        # shares t1 only
    + [("https://a.ex/p", "https://a.ex/self")]        # self drop
)


def test_pairs_and_dice(spark):
    rows = _run(spark, BASE, min_shared=2)
    # only (a,b) reaches the threshold: shared 2, dice 2000*2//(3+3)
    assert rows == [("a.ex", "b.ex", 2, 666)]
    # min_shared=1 also brings the single-target couplings
    rows1 = {(r[0], r[1]): r for r in _run(spark, BASE, min_shared=1)}
    assert rows1[("a.ex", "c.ex")] == ("a.ex", "c.ex", 1, 2000 // 4)
    assert rows1[("b.ex", "c.ex")][2] == 1


def test_target_cap_excludes_hubs(spark):
    # t1 is linked by 3 hosts; cap 2 removes it from blocking
    rows = _run(spark, BASE, min_shared=1, target_cap=2)
    got = {(r[0], r[1]): r[2] for r in rows}
    assert got == {("a.ex", "b.ex"): 1}  # only t2 couples them now


def test_mirror_agreement(spark):
    edges = BASE + _edges("d.ex", ["t2.ex", "t3.ex", "t4.ex", "t5.ex"])
    for kw in ({"min_shared": 1}, {"min_shared": 2},
               {"min_shared": 1, "target_cap": 2}):
        assert _run(spark, edges, **kw) == _duck(edges, **kw), kw
