"""Deterministic sharding + manifest tests (ops/shards.py)."""

import hashlib
import os
import sys
import tempfile

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.shards import (duckdb_shard_manifest_sql,
                                     shard_manifest, write_shards)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-shards-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


DOCS = [(0, "alpha"), (1, "beta gamma"), (2, ""), (3, None),
        (4, "delta"), (5, "éé")]  # 4 UTF-8 bytes


def _py_manifest(docs, n):
    out = {}
    for k, p in docs:
        shard = int(hashlib.md5(f"sh:{k}".encode()).hexdigest()[:12],
                    16) % n
        marker = "0" if p is None else "1"
        d = int(hashlib.md5(
            f"{k}:{marker}{p or ''}".encode()).hexdigest()[:15], 16)
        b = len((p or "").encode("utf-8"))
        nd, tb, cs = out.get(shard, (0, 0, 0))
        out[shard] = (nd + 1, tb + b, cs ^ d)
    return out


def test_manifest_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["shard"]: (r["n_docs"], r["total_bytes"], r["checksum"])
           for r in shard_manifest(docs, 4).collect()}
    assert got == _py_manifest(DOCS, 4)
    # utf-8 byte counting: 'éé' is 4 bytes, NULL counts 0
    assert sum(tb for _, tb, _ in got.values()) == 5 + 10 + 0 + 0 + 5 + 4


def test_manifest_duckdb_mirror(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(tuple(r) for r in shard_manifest(docs, 4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_shard_manifest_sql("d", 4)).fetchall())
    assert got == want


def test_manifest_order_independent_and_mergeable(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {r["shard"]: r["checksum"]
         for r in shard_manifest(docs, 2).collect()}
    rev = spark.createDataFrame(list(reversed(DOCS)),
                                "doc_id long, text string")
    b = {r["shard"]: r["checksum"]
         for r in shard_manifest(rev, 2).collect()}
    assert a == b
    # merge: xor of half-manifests equals the full manifest
    h1 = _py_manifest(DOCS[:3], 2)
    h2 = _py_manifest(DOCS[3:], 2)
    full = _py_manifest(DOCS, 2)
    for s in full:
        cs1 = h1.get(s, (0, 0, 0))[2]
        cs2 = h2.get(s, (0, 0, 0))[2]
        assert cs1 ^ cs2 == full[s][2]


def test_write_shards_roundtrip(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "shards")
        write_shards(docs, out, 4)
        back = spark.read.parquet(out)
        assert sorted((r["doc_id"], r["text"]) for r in back.collect()) \
            == sorted(DOCS)
        # every written shard dir matches the manifest's shard set
        dirs = {int(d.split("=")[1]) for d in os.listdir(out)
                if d.startswith("shard=")}
        want = {r["shard"] for r in shard_manifest(docs, 4).collect()}
        assert dirs == want
