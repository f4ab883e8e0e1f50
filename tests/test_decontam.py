"""ops/decontam.py: n-gram overlap counting, decontamination filter,
and the broadcast/no-distinct-shuffle plan shape."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overlap_counts_distinct_grams(spark):
    from hickoryspark.ops.decontam import ngram_overlap

    docs = _docs(spark, [
        # doc 1 shares its one 3-gram with the benchmark TWICE in the
        # text — counted once (distinct grams per doc)
        (1, "a b c x a b c"),
        (2, "a b c d"),       # grams: "a b c", "b c d" -> 1 hit
        (3, "z z z z"),       # no benchmark overlap
        (4, "a b"),           # shorter than n: zero grams
    ])
    bench = _docs(spark, [(100, "q q a b c q")])
    got = {r["doc_id"]: r["n_hits"]
           for r in ngram_overlap(docs, bench, n=3).collect()}
    assert got == {1: 1, 2: 1, 3: 0, 4: 0}


def test_decontaminate_filters_by_threshold(spark):
    from hickoryspark.ops.decontam import decontaminate

    docs = _docs(spark, [
        (1, "a b c d e"),     # 3 hits ("a b c", "b c d", "c d e")
        (2, "c d e f g"),     # 1 hit ("c d e")
        (3, "x y z w v"),     # 0 hits
    ])
    bench = _docs(spark, [(100, "a b c d e")])
    kept = {r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()}
    assert kept == {3}
    kept1 = {r["doc_id"]
             for r in decontaminate(docs, bench, n=3, max_hits=1).collect()}
    assert kept1 == {2, 3}


def test_benchmark_grams_deduped_across_docs(spark):
    from hickoryspark.ops.decontam import benchmark_ngrams

    bench = _docs(spark, [(1, "a b c"), (2, "a b c")])
    grams = [r["gram"] for r in benchmark_ngrams(bench, n=3).collect()]
    assert grams == ["a b c"]


def test_plan_broadcasts_bench_and_has_no_distinct_shuffle(spark):
    """The 100-TB shape: the benchmark gram set broadcasts (no
    sort-merge join of the corpus against it), and the only hash
    exchange is the per-doc count aggregation — per-doc gram dedup is
    row-local array_distinct, never a distinct shuffle."""
    from hickoryspark.ops.decontam import ngram_overlap

    docs = _docs(spark, [(i, "a b c d e f g h") for i in range(20)])
    bench = _docs(spark, [(100, "a b c d")])
    df = ngram_overlap(docs, bench, n=3)
    df.collect()  # materialize THIS df so AQE finalizes its plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    # the adaptive dump appends the pre-AQE "== Initial Plan ==" (which
    # legitimately holds the SMJ AQE later demotes) — grade the FINAL
    plan = plan.split("== Initial Plan ==")[0]
    # the bench gram join is an explicit broadcast left-semi; the
    # zero-fill left join of tiny counts gets AQE-promoted at runtime
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    # gram dedup is row-local: no exchange besides the count agg and
    # the zero-fill join's
    assert "array_distinct" in plan, plan
