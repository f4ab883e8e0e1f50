"""TrustRank (ops/graph.trustrank): seed-only teleport, trust decay
along links, spam isolation, mirror-style recurrence check."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-tr-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, edges, seeds, n_iter=2):
    from hickoryspark.ops.graph import trustrank

    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    return {r["id"]: r["rank_e12"]
            for r in trustrank(e, s, n_iter=n_iter).collect()}


def test_seed_bias_and_spam_isolation(spark):
    # trusted chain 0->1->2; disconnected spam clique 8<->9
    edges = [(0, 1), (1, 2), (8, 9), (9, 8)]
    got = _run(spark, edges, [0], n_iter=3)
    assert got[0] > got[1] > got[2] > 0
    # no seed mass ever reaches the spam pair
    assert got[8] == 0 and got[9] == 0


def test_recurrence_exact(spark):
    # hand-check one iteration: seeds {0}, edge 0->1, scale 1e12
    # r0 = [1e12, 0]; iter1: r(0) = tele = (1e12*15//100)//1 = 1.5e11
    # r(1) = 0 + (1e12*85)//(100*1) = 8.5e11
    got = _run(spark, [(0, 1)], [0], n_iter=1)
    assert got[0] == 150000000000
    assert got[1] == 850000000000


def test_seed_dedup_and_missing_node(spark):
    # duplicate seeds collapse; a seed absent from the edge set
    # still enters the node universe
    got = _run(spark, [(1, 2)], [5, 5], n_iter=1)
    assert got[5] == 150000000000  # keeps full tele (n_seeds=1)
    assert got[1] == 0


def test_unrolled_sql_agreement(spark):
    edges = [(i, (i * 7 + 1) % 20) for i in range(20)] + \
            [(i, (i * 13 + 3) % 20) for i in range(20)]
    seeds = [0, 10]
    got = _run(spark, edges, seeds, n_iter=3)
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    sql = """
      WITH nodes AS (SELECT DISTINCT src AS id FROM e
                     UNION SELECT dst FROM e),
      sd AS (SELECT * FROM (VALUES (0), (10)) s(id)),
      deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
      t0 AS (SELECT n.id, CASE WHEN s.id IS NULL THEN 0
                    ELSE 1000000000000 // 2 END AS rank
             FROM nodes n LEFT JOIN sd s ON s.id = n.id)"""
    for i in range(3):
        sql += f""",
      t{i + 1} AS (
        SELECT n.id,
               CASE WHEN s.id IS NULL THEN 0
                    ELSE ((1000000000000 * 15) // 100) // 2 END
               + COALESCE(SUM((t{i}.rank * 85) // (100 * deg.d)), 0)
                 AS rank
        FROM nodes n LEFT JOIN sd s ON s.id = n.id
        LEFT JOIN e ON e.dst = n.id
        LEFT JOIN deg ON deg.src = e.src
        LEFT JOIN t{i} ON t{i}.id = e.src
        GROUP BY n.id, s.id)"""
    sql += " SELECT id, CAST(rank AS BIGINT) FROM t3"
    want = dict(con.execute(sql).fetchall())
    assert got == want
