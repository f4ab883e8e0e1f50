"""Feature hashing: bucket range, sign balance, tf accumulation,
collision zero-sum retention, and the DuckDB mirror."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-featurehash-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _ref(token, k):
    h = hashlib.md5(b"fh:" + token.encode()).hexdigest()
    bucket = int(h[:12], 16) % k
    sign = 1 if int(h[12], 16) % 2 == 0 else -1
    return bucket, sign


def test_matches_md5_reference_and_accumulates(spark):
    from hickoryspark.ops.featurehash import feature_hash

    df = spark.createDataFrame(
        [(0, "cat cat dog"), (1, "cat")], "doc_id long, text string"
    )
    out = {(r["doc_id"], r["bucket"]): r["value"]
           for r in feature_hash(df, k=64).collect()}
    bc, sc = _ref("cat", 64)
    bd, sd = _ref("dog", 64)
    if bc == bd:
        assert out[(0, bc)] == 2 * sc + sd
    else:
        assert out[(0, bc)] == 2 * sc and out[(0, bd)] == sd
    assert out[(1, bc)] == sc
    assert all(0 <= b < 64 for _, b in out)


def test_duckdb_mirror_matches(spark):
    import duckdb

    from hickoryspark.ops.featurehash import (
        duckdb_feature_hash_sql, feature_hash)

    rows = [(i, f"tok{i % 7} tok{i % 5} shared word{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in feature_hash(df, k=32).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_feature_hash_sql("d", k=32)).fetchall())
    assert got == want
