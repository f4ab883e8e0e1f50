"""Per-host quotas (ops/quotas.host_quota): cap semantics, tie
cutting, NULL buckets, window-input bounding."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-quotas-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, rows, cap):
    from hickoryspark.ops.quotas import host_quota

    docs = spark.createDataFrame(
        rows, "host string, quality long, doc_id long")
    return sorted(
        ((r["host"], r["doc_id"])
         for r in host_quota(docs, cap).collect()),
        key=lambda t: (t[0] is None, t[0] or "", t[1]),
    )


def test_cap_and_tie_rule(spark):
    rows = [
        ("a", 9, 1), ("a", 9, 2), ("a", 5, 3), ("a", 5, 4), ("a", 5, 5),
        ("b", 1, 6),
    ]
    # cap 3 on host a: quality-9 bucket (2 rows) fully kept, cut
    # bucket quality-5 keeps 1 row = smallest doc_id 3
    assert _run(spark, rows, 3) == [("a", 1), ("a", 2), ("a", 3),
                                    ("b", 6)]


def test_exact_boundary_bucket_fully_kept(spark):
    rows = [("a", 7, 1), ("a", 7, 2), ("a", 3, 3)]
    assert _run(spark, rows, 2) == [("a", 1), ("a", 2)]
    assert _run(spark, rows, 3) == [("a", 1), ("a", 2), ("a", 3)]


def test_null_host_and_quality_buckets(spark):
    rows = [
        (None, 5, 1), (None, 5, 2), (None, 1, 3),
        ("a", None, 4), ("a", None, 5), ("a", 2, 6),
    ]
    # NULL host: cap 2 keeps the two quality-5 rows; host a: NULL
    # quality sorts LAST under DESC, so quality-2 + one NULL row kept
    out = _run(spark, rows, 2)
    assert (None, 1) in out and (None, 2) in out and (None, 3) not in out
    a_kept = [d for h, d in out if h == "a"]
    assert 6 in a_kept and len(a_kept) == 2


def test_matches_plain_window_reference(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hickoryspark.ops.quotas import host_quota

    rng = random.Random(23)
    rows = [(f"h{rng.randrange(5)}", rng.randrange(4), i)
            for i in range(200)]
    docs = spark.createDataFrame(
        rows, "host string, quality long, doc_id long")
    got = sorted((r["host"], r["doc_id"])
                 for r in host_quota(docs, 7).collect())
    w = Window.partitionBy("host").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc())
    want = sorted(
        (r["host"], r["doc_id"])
        for r in docs.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 7).collect()
    )
    assert got == want


def test_no_full_corpus_window(spark):
    # the only windows run over the HISTOGRAM (an Aggregate feeds
    # them) or the cut-bucket TIES (a join with the cut table feeds
    # them) — a naive row_number over raw corpus rows would sit
    # directly on the scan. Walk each physical Window's subtree by
    # indentation and require an Aggregate or Join below it; also
    # require at least one Window so the probe can't pass vacuously.
    from hickoryspark.ops.quotas import host_quota

    docs = spark.createDataFrame(
        [(f"h{i % 3}", i % 5, i) for i in range(60)],
        "host string, quality long, doc_id long")
    out = host_quota(docs, 4)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()

    def indent(s):
        return len(s) - len(s.lstrip(" +-*:"))

    n_windows = 0
    for k, line in enumerate(lines):
        if "Window [" not in line:
            continue
        n_windows += 1
        base = indent(line)
        subtree = []
        for nxt in lines[k + 1:]:
            if nxt.strip() and indent(nxt) <= base:
                break
            subtree.append(nxt)
        sub = "\n".join(subtree)
        assert ("Aggregate" in sub) or ("Join" in sub), (line, sub)
    assert n_windows >= 1, plan
