"""AMP pairing (ops/amp.py) and SRI audit (ops/resources.sri_audit)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-ampsri-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _nodes(spark, pages):
    from hickoryspark.spark.nodes_table import explode_nodes

    return explode_nodes(spark.createDataFrame(
        pages, "url string, html string"))


def test_amp_links_pairing(spark):
    from hickoryspark.ops.amp import amp_links

    got = {
        (r["url"], r["kind"]): (r["is_amp"], r["target"])
        for r in amp_links(_nodes(spark, [
            # canonical page advertising its AMP twin
            ("https://s.ex/a/art",
             '<link rel=" AMPHTML " href="amp/">x'),
            # AMP page (⚡ marker) pointing back; first canonical wins
            ("https://s.ex/a/amp/art",
             '<html ⚡><link rel=canonical href="/a/art">'
             '<link rel=canonical href="/ignored"></html>'),
            # amp attribute marker; combined rel emits both kinds
            ("https://s.ex/b",
             '<html amp><link rel="amphtml canonical" href="x"></html>'),
            # no matched links -> no rows even with the marker
            ("https://s.ex/c", "<html amp><p>t</p></html>"),
        ])).collect()
    }
    assert got[("https://s.ex/a/art", "amphtml")] == (
        0, "https://s.ex/a/amp/")
    assert got[("https://s.ex/a/amp/art", "canonical")] == (
        1, "https://s.ex/a/art")
    assert got[("https://s.ex/b", "amphtml")] == (1, "https://s.ex/x")
    assert got[("https://s.ex/b", "canonical")] == (1, "https://s.ex/x")
    assert not any(u == "https://s.ex/c" for u, _ in got)
    assert len(got) == 4


def test_sri_audit_counts(spark):
    from hickoryspark.ops.resources import sri_audit

    b64 = "oqVuAfXRKap7fdgcCY5uykM6+R9GqQ8K/uxy9rx7HNQlGYl1kPzQho1wx4JwY8wC"
    got = {
        r["url"]: (r["n_ext_scripts"], r["n_sri_scripts"],
                   r["n_stylesheets"], r["n_sri_styles"],
                   r["n_invalid_integrity"])
        for r in sri_audit(_nodes(spark, [
            ("u1",
             f'<script src="/a.js" integrity="sha384-{b64}"></script>'
             '<script src="/b.js"></script>'
             f'<link rel=stylesheet href="/s.css" integrity="SHA256-{b64}">'),
            # invalid: bad algo, empty, non-base64; inline script has
            # no src and never counts
            ("u2",
             '<script src="/a.js" integrity="md5-abc"></script>'
             '<link rel=stylesheet href="/s.css" integrity="">'
             '<script integrity="sha256-xyz">var a;</script>'
             f'<script src="/c.js" integrity="junk sha512-{b64}?opt">'
             "</script>"),
        ])).collect()
    }
    assert got["u1"] == (2, 1, 1, 1, 0)
    assert got["u2"] == (2, 1, 1, 0, 2)
