"""Token P/R/F1 (ops/evalmetrics.py): multiset semantics, empty and
NULL sides, whitespace handling, exact fractions."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-eval-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_multiset_overlap_and_fractions(spark):
    from hickoryspark.ops.evalmetrics import token_prf

    rows = [
        # pred has 'a' twice, gold once -> tp counts it ONCE
        (1, "a a b", "a b c d"),
        (2, "x y", "x y"),          # perfect
        (3, "zz", "ww"),            # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, pred string, gold string")
    got = {r["doc_id"]: r for r in token_prf(df).collect()}
    r1 = got[1]
    assert (r1["tp"], r1["n_pred"], r1["n_gold"]) == (2, 3, 4)
    assert r1["precision"] == round(2 / 3, 6)
    assert r1["recall"] == 0.5
    assert r1["f1"] == round(4 / 7, 6)
    assert got[2]["f1"] == 1.0 and got[2]["precision"] == 1.0
    assert got[3]["tp"] == 0 and got[3]["f1"] == 0.0


def test_empty_and_null_sides(spark):
    from hickoryspark.ops.evalmetrics import token_prf

    rows = [
        (1, "", "a b"),     # empty pred: precision NULL (0/0), recall 0
        (2, "a", None),     # NULL gold
        (3, "", ""),        # both empty: every ratio NULL, row present
        (4, " \t ", "a"),   # whitespace-only pred == empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, pred string, gold string")
    got = {r["doc_id"]: r for r in token_prf(df).collect()}
    assert len(got) == 4
    assert got[1]["precision"] is None and got[1]["recall"] == 0.0
    assert got[2]["recall"] is None and got[2]["precision"] == 0.0
    assert got[3]["tp"] == 0 and got[3]["f1"] is None
    assert got[4]["n_pred"] == 0 and got[4]["n_gold"] == 1
