"""Corpus mixture sampling (ops/mixture.py): exact-integer rate rule,
binding stratum keeps all, unweighted strata drop, absent-stratum
weights ignored, weight validation, determinism / partition
invariance, hash-rule agreement with the sampling permille."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-mixture-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _docs(spark, counts: dict[str, int]):
    rows, i = [], 0
    for stratum, n in counts.items():
        for _ in range(n):
            rows.append((i, stratum))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def _permille(key: int, salt: str = "mix0") -> int:
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:6]
    return int(h, 16) % 1000


def test_rates_exact_integer_rule(spark):
    from hickoryspark.ops.mixture import mixture_rates

    docs = _docs(spark, {"a": 100, "b": 100, "c": 100})
    rates = {r["stratum"]: (r["n_rows"], r["rate_permille"])
             for r in mixture_rates(
                 docs, {"a": 500, "b": 300, "c": 200}).collect()}
    # equal counts: binding stratum is the max weight -> rate 1000;
    # others scale proportionally: M = 100*1e6/500 = 200000
    assert rates == {"a": (100, 1000), "b": (100, 600), "c": (100, 400)}


def test_binding_stratum_keeps_all_and_floor(spark):
    from hickoryspark.ops.mixture import mixture_rates

    # c is scarce relative to its weight -> c binds (rate 1000)
    docs = _docs(spark, {"a": 300, "c": 10})
    rates = {r["stratum"]: r["rate_permille"]
             for r in mixture_rates(docs, {"a": 700, "c": 300}).collect()}
    # M = min(300*1e6/700, 10*1e6/300) = min(428571, 33333) = 33333
    # a: (700*33333) div (300*1000) = 23333100 div 300000 = 77
    assert rates == {"a": 77, "c": 1000}


def test_drop_unweighted_and_ignore_absent(spark):
    from hickoryspark.ops.mixture import mixture_rates, mixture_sample

    docs = _docs(spark, {"a": 50, "b": 50, "zzz": 50})
    # 'zzz' has no weight -> dropped; 'ghost' names no data -> ignored
    weights = {"a": 600, "b": 300, "ghost": 100}
    rates = {r["stratum"]: r["rate_permille"]
             for r in mixture_rates(docs, weights).collect()}
    assert set(rates) == {"a", "b"} and rates["a"] == 1000
    kept = mixture_sample(docs, weights).collect()
    assert {r["source"] for r in kept} <= {"a", "b"}
    assert all(r["rate_permille"] in (1000, rates["b"]) for r in kept)


def test_selection_matches_permille_hash(spark):
    from hickoryspark.ops.mixture import mixture_rates, mixture_sample

    docs = _docs(spark, {"a": 80, "b": 40})
    weights = {"a": 500, "b": 500}
    rates = {r["stratum"]: r["rate_permille"]
             for r in mixture_rates(docs, weights).collect()}
    kept = {r["doc_id"] for r in mixture_sample(docs, weights).collect()}
    want = {r["doc_id"] for r in docs.collect()
            if _permille(r["doc_id"]) < rates[r["source"]]}
    assert kept == want


def test_weight_validation(spark):
    from hickoryspark.ops.mixture import mixture_rates

    docs = _docs(spark, {"a": 10})
    for bad in ({}, {"a": 999}, {"a": 1100, "b": -100}, {"a": 0, "b": 1000}):
        with pytest.raises(ValueError):
            mixture_rates(docs, bad)


def test_partition_invariance(spark):
    from hickoryspark.ops.mixture import mixture_sample

    docs = _docs(spark, {"a": 120, "b": 60, "c": 30})
    weights = {"a": 400, "b": 400, "c": 200}
    one = sorted(map(tuple, mixture_sample(docs, weights).collect()))
    two = sorted(map(tuple, mixture_sample(
        docs.repartition(7), weights).collect()))
    assert one == two and len(one) > 0
