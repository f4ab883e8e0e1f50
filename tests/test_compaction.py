"""Compaction-plan invariants: next-fit packing matches a sequential
reference, full files become singleton groups after the packed range,
NULL partitions plan correctly, and the DuckDB mirror agrees."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-compaction-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _ref_plan(rows, target):
    # independent sequential reference of the pinned rule
    from collections import defaultdict

    by_part = defaultdict(list)
    for part, fid, b in rows:
        by_part[part].append((fid, b))
    out = {}
    for part, fs in by_part.items():
        small = sorted([f for f in fs if f[1] < target],
                       key=lambda f: (-f[1], f[0]))
        cum = 0
        max_g = -1
        for fid, b in small:
            g = cum // target
            out[(part, fid)] = (g, False)
            max_g = max(max_g, g)
            cum += b
        full = sorted([f for f in fs if f[1] >= target],
                      key=lambda f: (-f[1], f[0]))
        for i, (fid, b) in enumerate(full):
            out[(part, fid)] = (max_g + 1 + i, True)
    return out


ROWS = [
    ("p1", 1, 10), ("p1", 2, 90), ("p1", 3, 40), ("p1", 4, 60),
    ("p1", 5, 250), ("p1", 6, 100),  # two healthy files (>= 100)
    ("p2", 7, 5), ("p2", 8, 5),
    (None, 9, 30), (None, 10, 500),  # NULL partition still plans
]


def test_plan_matches_sequential_reference(spark):
    from hickoryspark.ops.compaction import compaction_plan

    df = spark.createDataFrame(ROWS, "part string, file_id long, bytes long")
    got = {
        (r["part"], r["file_id"]): (r["group_id"], r["full"])
        for r in compaction_plan(df, 100).collect()
    }
    assert got == _ref_plan(ROWS, 100)
    # full files occupy ids after the packed range, never colliding
    p1 = {fid: g for (p, fid), (g, _) in got.items() if p == "p1"}
    assert len(set(p1.values())) >= 3 and p1[5] != p1[6]
    # NULL partition: packed file in group 0, full file after it
    assert got[(None, 9)] == (0, False) and got[(None, 10)] == (1, True)


def test_groups_respect_target_next_fit(spark):
    from hickoryspark.ops.compaction import compaction_plan

    rows = [("p", i, 30) for i in range(10)]
    df = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    out = compaction_plan(df, 100).collect()
    sizes = {}
    for r in out:
        sizes[r["group_id"]] = sizes.get(r["group_id"], 0) + r["bytes"]
    # next-fit on equal sizes: groups of floor semantics — every group
    # except possibly the last holds >= target-30 bytes
    gids = sorted(sizes)
    assert all(sizes[g] >= 70 for g in gids[:-1])
    assert sum(sizes.values()) == 300


def test_duckdb_mirror_matches(spark):
    import duckdb

    from hickoryspark.ops.compaction import (
        compaction_plan, duckdb_compaction_sql)

    key = lambda t: (t[0] is None, t[0] or "", t[1])
    df = spark.createDataFrame(ROWS, "part string, file_id long, bytes long")
    got = sorted((tuple(r) for r in compaction_plan(df, 100).collect()),
                 key=key)
    con = duckdb.connect()
    con.execute("CREATE TABLE f(part VARCHAR, file_id BIGINT, bytes BIGINT)")
    con.executemany("INSERT INTO f VALUES (?, ?, ?)", ROWS)
    want = sorted((tuple(r) for r in
                   con.execute(duckdb_compaction_sql("f", 100)).fetchall()),
                  key=key)
    assert got == want
