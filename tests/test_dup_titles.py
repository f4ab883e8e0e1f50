"""Duplicate-title clusters (ops/metadata.duplicate_titles)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-duptitles-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, rows, **kw):
    from hickoryspark.ops.metadata import duplicate_titles

    meta = spark.createDataFrame(rows, "url string, title string")
    return {(r["host"], r["title"]): (r["n_pages"], r["first_url"])
            for r in duplicate_titles(meta, **kw).collect()}


def test_clusters_per_host_and_threshold(spark):
    out = _run(spark, [
        ("https://a.ex/1", "Home"),
        ("https://a.ex/2", "Home"),
        ("https://A.EX./3", "Home"),          # host folds -> a.ex
        ("https://b.ex/1", "Home"),           # different host: own count
        ("https://a.ex/4", "Unique"),
        ("https://a.ex/5", ""),
        ("https://a.ex/6", None),
        ("rel/7", "Home"),                    # hostless drops
        ("https://a.ex/1", "Home"),           # same url twice: distinct urls
    ])
    assert out == {("a.ex", "Home"): (3, "https://A.EX./3")}


def test_min_pages_parameter(spark):
    out = _run(spark, [
        ("https://a.ex/1", "T"), ("https://b.ex/1", "U"),
    ], min_pages=1)
    assert out == {("a.ex", "T"): (1, "https://a.ex/1"),
                   ("b.ex", "U"): (1, "https://b.ex/1")}
