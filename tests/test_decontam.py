"""Benchmark decontamination tests (ops/decontam.py)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.decontam import decontaminate, duckdb_decontam_sql


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-decontam-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "quick brown fox jumps over nothing at all here now"),
    (2, "completely unrelated content with no overlap whatsoever"),
    (3, "alpha beta"),          # shorter than n — only short grams hit
    (4, ""),                    # empty — never contaminated
    (5, "x alpha beta y quick brown fox jumps z"),
]
BENCH = [
    (100, "quick brown fox jumps"),   # 4-gram windows (n=4 below)
    (101, "alpha beta"),              # short item -> whole-seq gram
    (102, "zz qq"),                   # matches nothing
    (103, "   "),                     # zero tokens -> contributes nothing
]


def _py_decontam(corpus, bench, n):
    out = {}
    bgrams = {}
    for bid, t in bench:
        toks = t.split()
        if not toks:
            continue
        L = min(n, len(toks))
        for i in range(len(toks) - L + 1):
            bgrams.setdefault((L, " ".join(toks[i:i + L])), set()).add(bid)
    for did, t in corpus:
        toks = t.split()
        hits, bids = set(), set()
        for (L, g), ids in bgrams.items():
            for i in range(len(toks) - L + 1):
                if " ".join(toks[i:i + L]) == g:
                    hits.add(g)
                    bids |= ids
        if hits:
            out[did] = (len(hits), len(bids))
    return out


def test_decontam_matches_python_reference(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "bench_id long, text string")
    got = {r["doc_id"]: (r["n_hit_grams"], r["n_bench_docs"])
           for r in decontaminate(corpus, bench, n=4).collect()}
    want = _py_decontam(CORPUS, BENCH, 4)
    assert got == want
    # doc 0/1/5 share the 4-gram; doc 3 and 5 hit the short item
    assert 0 in got and 1 in got and 3 in got and 5 in got
    assert 2 not in got and 4 not in got
    assert got[5][1] == 2  # both bench items implicated


def test_decontam_duckdb_mirror(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "bench_id long, text string")
    got = sorted(tuple(r) for r in
                 decontaminate(corpus, bench, n=4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE c (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", CORPUS)
    con.execute("CREATE TABLE b (bench_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO b VALUES (?, ?)", BENCH)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_decontam_sql("c", "b", n=4)).fetchall())
    assert got == want


def test_decontam_no_tokenizable_bench_raises(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame([(0, "  ")], "bench_id long, text string")
    with pytest.raises(ValueError):
        decontaminate(corpus, bench, n=4)


def test_decontam_standard_n13_path(spark):
    # all bench items >= 13 tokens -> single width, no fallback union
    text = " ".join(f"w{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [(0, "pad " + text), (1, "nothing shared here")],
        "doc_id long, text string")
    bench = spark.createDataFrame([(9, text)], "bench_id long, text string")
    got = {r["doc_id"]: r["n_hit_grams"]
           for r in decontaminate(corpus, bench, n=13).collect()}
    assert got == {0: 8}  # 20-13+1 windows, all present in doc 0


def test_both_decontam_apis_coexist(spark):
    # regression: the 13-gram window rewrite once dropped the original
    # distinct-gram API and silently broke the decontam_overlap gate
    # (caught only by a full parity sweep) — both must stay importable
    # and behaviorally sane
    from hickoryspark.ops.decontam import (benchmark_ngrams,
                                           decontaminate, ngram_overlap)

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "z z z z z"), (3, "c d e f g")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(1, "b c d")], "doc_id long, text string")
    assert benchmark_ngrams(bench, n=3).count() == 1
    out = {r["doc_id"]: r["n_hits"]
           for r in ngram_overlap(docs, bench, n=3).collect()}
    assert out == {1: 1, 2: 0, 3: 0}
    assert callable(decontaminate)
