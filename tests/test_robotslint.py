"""robots.txt lint (ops/robotslint.py): counter semantics vs the
shared group state machine, DataFrame wrapper."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.ops.robotslint import lint_robots  # noqa: E402


def test_counters():
    content = "\n".join([
        "Disallow: /orphan",          # orphan (before any UA)
        "User-agent: a",
        "User-agent: b",              # same run -> one group
        "Disallow: /x",
        "Allow: /x/y",
        "Unknown-directive: v",       # unknown
        "User-agent: *",              # new group, catchall
        "Crawl-delay: 2",
        "Sitemap: https://h/s.xml",
        "# pure comment",             # not a line
        "",
    ])
    assert lint_robots(content) == (9, 2, 2, 1, 1, 1, 1)


def test_empty_and_unknown_only():
    assert lint_robots("") == (0, 0, 0, 0, 0, 0, 0)
    assert lint_robots("Foo: bar\nBaz: qux") == (2, 0, 0, 0, 2, 0, 0)


def test_interrupted_run_makes_new_group():
    content = "\n".join([
        "User-agent: a", "Disallow: /p",
        "User-agent: a", "Allow: /q",   # run interrupted -> 2 groups
    ])
    assert lint_robots(content) == (4, 2, 2, 0, 0, 0, 0)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-rlint-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_dataframe_wrapper(spark):
    from hickoryspark.ops.robotslint import lint_robots_df

    rows = [("h1", "User-agent: *\nDisallow: /x"),
            ("h2", None)]
    df = spark.createDataFrame(rows, "host string, content string")
    got = sorted(tuple(r) for r in lint_robots_df(df).collect())
    assert got == [("h1", 2, 1, 1, 0, 0, 0, 1)]
