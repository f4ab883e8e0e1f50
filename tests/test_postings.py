"""Inverted-index postings (ops/postings.py): positions, tf,
position_cap truncation, term stats, plan shape."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-postings-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the\t\tdog  ran"),
    (2, "   "),
    (3, "cat cat cat"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_positions_skip_empties(spark):
    from hickoryspark.ops.postings import build_postings

    rows = {(r["term"], r["doc_id"]): (r["tf"], r["positions"],
                                       r["n_positions"])
            for r in build_postings(_df(spark)).collect()}
    assert rows[("the", 0)] == (2, "0,4", 2)
    assert rows[("mat", 0)] == (1, "5", 1)
    # runs of whitespace collapse: dog is position 1, ran position 2
    assert rows[("dog", 1)] == (1, "1", 1)
    assert rows[("ran", 1)] == (1, "2", 1)
    assert rows[("cat", 3)] == (3, "0,1,2", 3)
    # whitespace-only doc contributes nothing
    assert not any(d == 2 for (_, d) in rows)


def test_position_cap_truncates_positions_not_tf(spark):
    from hickoryspark.ops.postings import build_postings

    rows = {(r["term"], r["doc_id"]): (r["tf"], r["positions"],
                                       r["n_positions"])
            for r in build_postings(_df(spark), position_cap=2).collect()}
    assert rows[("cat", 3)] == (3, "0,1", 2)
    with pytest.raises(ValueError):
        build_postings(_df(spark), position_cap=0)


def test_term_stats(spark):
    from hickoryspark.ops.postings import term_stats

    rows = {r["term"]: (r["df"], r["cf"])
            for r in term_stats(_df(spark)).collect()}
    assert rows["the"] == (2, 3)
    assert rows["cat"] == (2, 4)
    assert rows["mat"] == (1, 1)


def test_no_window_in_plan(spark):
    # the stopword-funnel rule: postings must aggregate, never window
    from hickoryspark.ops.postings import build_postings, term_stats

    for df in (build_postings(_df(spark)), term_stats(_df(spark))):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
