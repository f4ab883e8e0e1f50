"""Windowed co-occurrence PMI: pair generation vs an independent
sliding-window reference, PMI formula arithmetic, min-count filter,
and the DuckDB mirror agreement."""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-cooccur-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


DOCS = [
    (0, "new york new york city hall"),
    (1, "the city of new york the"),
    (2, "york new minute"),
    (3, "a b c d e"),
]


def _ref(docs, window, min_count):
    pair_c, tok_c = Counter(), Counter()
    t_pairs = 0
    for _, text in docs:
        toks = text.split(" ")
        tok_c.update(toks)
        for i, a in enumerate(toks):
            for o in range(1, window + 1):
                if i + o < len(toks):
                    b = toks[i + o]
                    pair_c[(min(a, b), max(a, b))] += 1
                    t_pairs += 1
    n = sum(tok_c.values())
    out = {}
    for (w1, w2), c in pair_c.items():
        if c >= min_count:
            pmi = round(
                math.log((c * n * n) / (t_pairs * tok_c[w1] * tok_c[w2])), 6
            )
            out[(w1, w2)] = (c, pmi)
    return out


def test_matches_sliding_window_reference(spark):
    from hickoryspark.ops.cooccur import cooccurrence_pmi

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["n_pairs"], r["pmi"])
        for r in cooccurrence_pmi(df, window=2, min_count=2).collect()
    }
    want = _ref(DOCS, 2, 2)
    assert got == want
    # the 'new york' collocation is found in both orders collapsed
    assert ("new", "york") in got and got[("new", "york")][0] >= 4


def test_duckdb_mirror_matches(spark):
    import duckdb

    from hickoryspark.ops.cooccur import cooccurrence_pmi, duckdb_cooccur_sql

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [tuple(r) for r in
           cooccurrence_pmi(df, window=3, min_count=1, top_k=30).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    want = [tuple(r) for r in con.execute(
        duckdb_cooccur_sql("d", window=3, min_count=1, top_k=30)).fetchall()]
    assert got == want


def test_short_docs_emit_no_pairs(spark):
    from hickoryspark.ops.cooccur import cooccurrence_pmi

    df = spark.createDataFrame(
        [(0, "solo"), (1, "")], "doc_id long, text string"
    )
    assert cooccurrence_pmi(df, window=3, min_count=1).count() == 0
