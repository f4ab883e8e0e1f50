"""Integer-BM25 retrieval tests (ops/retrieval.py)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.retrieval import bm25_scores, duckdb_bm25_sql


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-retrieval-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


DOCS = [
    (0, "spark join hash join"),
    (1, "merge sort window"),
    (2, "join order join join spark"),
    (3, "scan"),
    (4, ""),
]
QUERIES = [(0, "join spark"), (1, "scan"), (2, "nosuchterm"),
           (3, "join join")]  # query dupes collapse


def _py_bm25(docs, queries, top_k=10):
    from collections import Counter

    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    total = sum(len(t) for t in toks.values())
    avgdl = total // n
    tfs = {d: Counter(t) for d, t in toks.items()}
    out = []
    for qid, q in queries:
        scores = {}
        for term in sorted(set(q.split())):
            df = sum(1 for d in tfs if tfs[d][term] > 0)
            if df == 0:
                continue
            for d in tfs:
                tf = tfs[d][term]
                if tf == 0:
                    continue
                dl = len(toks[d])
                c = (1000 * 22 * avgdl * tf * (2 * n - 2 * df + 1)) // (
                    (2 * df + 1) * (10 * avgdl * tf + 3 * avgdl + 9 * dl))
                scores[d] = scores.get(d, 0) + c
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for r, (d, s) in enumerate(ranked[:top_k], 1):
            out.append((qid, d, s, r))
    return sorted(out)


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    got = sorted(tuple(r) for r in bm25_scores(docs, qs).collect())
    assert got == _py_bm25(DOCS, QUERIES)
    # query 2 (absent term) yields nothing; empty doc never appears
    assert all(q != 2 for q, *_ in got)
    assert all(d != 4 for _, d, *_ in got)
    # dupe-term query equals its single-term version per doc
    by_q = {}
    for q, d, s, r in got:
        by_q.setdefault(q, {})[d] = s
    shared = set(by_q[0]) & set(by_q[3])
    assert shared and all(by_q[3][d] <= by_q[0][d] for d in shared)


def test_bm25_duckdb_mirror(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    got = sorted(tuple(r) for r in bm25_scores(docs, qs, top_k=3).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    vals = ", ".join(f"({q}, '{t}')" for q, t in QUERIES)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_bm25_sql("d", vals, top_k=3)).fetchall())
    assert got == want


def test_bm25_topk_and_ties(spark):
    # identical docs tie -> doc_id ascending decides
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(6)],
        "doc_id long, text string")
    qs = spark.createDataFrame([(0, "same")], "query_id long, query string")
    got = bm25_scores(docs, qs, top_k=4).collect()
    assert [r["doc_id"] for r in
            sorted(got, key=lambda r: r["rank"])] == [0, 1, 2, 3]
    assert len({r["score_milli"] for r in got}) == 1
