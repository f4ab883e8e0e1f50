"""Paywall detection (ops/paywall.py): carrier extraction through the
real parser, verdict rule, case-insensitivity, NULLs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-paywall-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


PAGES = [
    # JSON-LD false -> paywalled regardless of anything else
    ("p1", b'<html><head><script type="application/ld+json">'
           b'{"@type":"NewsArticle","isAccessibleForFree":false}'
           b'</script></head><body><p>full story</p></body></html>'),
    # phrase + noarchive -> paywalled
    ("p2", b'<html><head>'
           b'<meta name=ROBOTS content="noindex , NOARCHIVE">'
           b'</head><body><p>Subscribe To Continue reading this'
           b'</p></body></html>'),
    # phrase alone -> NOT paywalled
    ("p3", b'<html><body><p>subscribers only offer</p></body></html>'),
    # noarchive alone -> NOT paywalled
    ("p4", b'<html><head><meta name=robots content=noarchive></head>'
           b'<body><p>free text</p></body></html>'),
    # JSON-LD true -> not a paywall signal
    ("p5", b'<html><head><script type="application/ld+json">'
           b'{"isAccessibleForFree":true}</script></head>'
           b'<body><p>x</p></body></html>'),
]

TEXTS = [
    ("p1", "full story"),
    ("p2", "Subscribe To Continue reading this"),
    ("p3", "subscribers only offer"),
    ("p4", "free text"),
    ("p5", None),
]


def test_signals(spark):
    from hickoryspark.ops.paywall import paywall_signals
    from hickoryspark.spark.nodes_table import explode_nodes

    pages = spark.createDataFrame(PAGES, "url string, html binary")
    texts = spark.createDataFrame(TEXTS, "url string, text string")
    got = {r["url"]: (r["ld_paywall"], r["noarchive"],
                      r["phrase_hit"], r["is_paywalled"])
           for r in paywall_signals(explode_nodes(pages),
                                    texts).collect()}
    assert got == {
        "p1": (1, 0, 0, 1),
        "p2": (0, 1, 1, 1),
        "p3": (0, 0, 1, 0),
        "p4": (0, 1, 0, 0),
        "p5": (0, 0, 0, 0),
    }
