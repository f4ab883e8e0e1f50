"""meta http-equiv=refresh parsing (ops/metadata.meta_refresh):
delay forms, url= casing, quotes, invalid rows, delay-only refresh,
resolution."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-refresh-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, pages):
    from hickoryspark.spark.nodes_table import explode_nodes
    from hickoryspark.ops.metadata import meta_refresh

    df = spark.createDataFrame(pages, "url string, html string")
    rows = meta_refresh(explode_nodes(df)).collect()
    return sorted(
        (r["url"], r["meta_pos"], r["delay_secs"], r["target"], r["resolved"])
        for r in rows
    )


def test_parse_forms(spark):
    base = "https://h.ex/a/b"
    metas = [
        '<meta http-equiv="refresh" content="0; url=/next">',
        '<meta http-equiv=REFRESH content=" 5 ; URL = c.html ">',
        "<meta http-equiv='refresh' content=\"3;url='../up'\">",
        '<meta http-equiv="refresh" content="2.5, https://other.ex/x">',
        '<meta http-equiv="refresh" content="7">',  # delay-only
        '<meta http-equiv="refresh" content="abc; url=/bad">',  # invalid
        '<meta http-equiv="refresh">',  # no content
        '<meta name="refresh" content="1; url=/not-http-equiv">',
    ]
    html = "<head>" + "".join(metas) + "</head>"
    got = _run(spark, [(base, html)])
    assert got == sorted([
        (base, 1, 0, "/next", "https://h.ex/next"),
        (base, 2, 5, "c.html", "https://h.ex/a/c.html"),
        (base, 3, 3, "../up", "https://h.ex/up"),
        (base, 4, 2, "https://other.ex/x", "https://other.ex/x"),
        (base, 5, 7, None, None),
    ])


def test_quote_unwrap_and_empty(spark):
    base = "https://h.ex/"
    html = (
        '<meta http-equiv="refresh" content="1;url=&quot;/q path&quot;">'
        "<meta http-equiv=refresh content=\"2;url=''\">"
        '<meta http-equiv=refresh content="4; ">'
    )
    got = _run(spark, [(base, html)])
    # quoted target unwrapped verbatim (inner spaces kept); quoted
    # empty and blank tails -> NULL target
    assert got == sorted([
        (base, 1, 1, "/q path", "https://h.ex/q path"),
        (base, 2, 2, None, None),
        (base, 3, 4, None, None),
    ])
