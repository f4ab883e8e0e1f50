"""Leakage-safe splits (ops/splits.py): component cohesion (the whole
point), singleton handling, weight validation, determinism, hash-rule
agreement with the sampling permille."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-splits-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _permille(key: int, salt: str = "split0") -> int:
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:6]
    return int(h, 16) % 1000


def test_components_share_split_and_singletons(spark):
    from hickoryspark.ops.splits import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    # chain 0-1-2, pair 10-11; everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: (r["component"], r["split"])
            for r in leakage_safe_split(docs, pairs).collect()}
    assert rows[0] == rows[1] == rows[2] == (0, rows[0][1])
    assert rows[10] == rows[11] == (10, rows[10][1])
    for i in (3, 4, 29):
        assert rows[i][0] == i
    # split follows the permille hash of the COMPONENT id
    for i, (comp, split) in rows.items():
        b = _permille(comp)
        want = "train" if b < 900 else ("valid" if b < 950 else "test")
        assert split == want, (i, comp, b)


def test_weight_validation_and_custom_splits(spark):
    from hickoryspark.ops.splits import assign_splits, leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    with pytest.raises(ValueError):
        leakage_safe_split(docs, empty, splits=[("a", 500), ("b", 400)])
    with pytest.raises(ValueError):
        leakage_safe_split(docs, empty, splits=[("a", 1100), ("b", -100)])
    comps = spark.createDataFrame([], "doc_id long, component long")
    rows = assign_splits(docs, comps, splits=[("x", 1000)]).collect()
    assert {r["split"] for r in rows} == {"x"}
    assert {r["component"] for r in rows} == set(range(10))


def test_partition_invariance(spark):
    from hickoryspark.ops.splits import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(0, 100, 3)], "doc_a long, doc_b long")
    a = sorted(map(tuple, leakage_safe_split(docs, pairs).collect()))
    b = sorted(map(tuple, leakage_safe_split(
        docs.repartition(7), pairs.repartition(5)).collect()))
    assert a == b and len(a) == 200
