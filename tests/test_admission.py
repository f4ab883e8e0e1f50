"""Admission-policy merge (ops/admission.py): carrier defaults,
reason priority, implication invariants, absent-carrier frames."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-admission-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, pages, robots=None, http=None, meta=None):
    from hickoryspark.ops.admission import admission_policy

    p = spark.createDataFrame([(u,) for u in pages], "url string")
    r = (
        None if robots is None
        else spark.createDataFrame(robots, "url string, allowed boolean")
    )
    h = (
        None if http is None
        else spark.createDataFrame(
            http,
            "url string, status int, noindex boolean, nofollow boolean",
        )
    )
    m = (
        None if meta is None
        else spark.createDataFrame(
            m_rows := meta, "url string, noindex boolean, nofollow boolean"
        )
    )
    return {
        row["url"]: (row["crawl_ok"], row["index_ok"], row["follow_ok"],
                     row["reason"])
        for row in admission_policy(p, r, h, m).collect()
    }


def test_defaults_absent_rows_admit(spark):
    # url with NO row in any carrier frame: fully admitted
    out = _run(
        spark, ["u1"], robots=[("x", False)],
        http=[("x", 200, True, True)], meta=[("x", True, True)],
    )
    assert out["u1"] == (True, True, True, "")


def test_defaults_absent_frames_admit(spark):
    out = _run(spark, ["u1"])
    assert out["u1"] == (True, True, True, "")


def test_robots_disallow_blocks_everything(spark):
    out = _run(spark, ["u"], robots=[("u", False)])
    assert out["u"] == (False, False, False, "robots_disallow")


def test_http_error_blocks_index_not_follow(spark):
    out = _run(spark, ["u"], http=[("u", 404, False, False)])
    assert out["u"] == (True, False, True, "http_error")


def test_status_399_not_an_error(spark):
    out = _run(spark, ["u"], http=[("u", 399, False, False)])
    assert out["u"] == (True, True, True, "")


def test_header_noindex(spark):
    out = _run(spark, ["u"], http=[("u", 200, True, False)])
    assert out["u"] == (True, False, True, "http_noindex")


def test_meta_noindex_and_nofollow(spark):
    out = _run(spark, ["u"], meta=[("u", True, True)])
    assert out["u"] == (True, False, False, "meta_noindex")


def test_reason_priority_robots_over_http_over_meta(spark):
    out = _run(
        spark, ["a", "b", "c"],
        robots=[("a", False), ("b", True), ("c", True)],
        http=[("a", 500, True, False), ("b", 410, True, False),
              ("c", 200, True, False)],
        meta=[("a", True, False), ("b", True, False), ("c", True, False)],
    )
    assert out["a"][3] == "robots_disallow"
    assert out["b"][3] == "http_error"
    assert out["c"][3] == "http_noindex"


def test_nofollow_channels_independent_of_index_reason(spark):
    # header nofollow + meta noindex: index blocked by meta, follow by
    # header — reason reports the INDEX chain only
    out = _run(
        spark, ["u"], http=[("u", 200, False, True)],
        meta=[("u", True, False)],
    )
    assert out["u"] == (True, False, False, "meta_noindex")


def test_null_status_row_is_not_an_error(spark):
    out = _run(spark, ["u"], http=[("u", None, False, True)])
    assert out["u"] == (True, True, False, "")


def test_implications_hold_on_cross_product(spark):
    # index_ok/follow_ok never true when crawl_ok false, over every
    # carrier combination
    urls, robots, http, meta = [], [], [], []
    i = 0
    for allowed in (None, True, False):
        for status in (None, 200, 404):
            for ni in (False, True):
                u = f"u{i}"
                i += 1
                urls.append(u)
                if allowed is not None:
                    robots.append((u, allowed))
                if status is not None:
                    http.append((u, status, ni, False))
                meta.append((u, False, ni))
    out = _run(spark, urls, robots=robots or None,
               http=http or None, meta=meta)
    for u, (c, ix, fo, reason) in out.items():
        assert not (ix and not c), u
        assert not (fo and not c), u
        assert (reason == "") == ix, u
