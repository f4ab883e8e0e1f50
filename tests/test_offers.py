"""Product/offer extraction (ops/offers.py): carrier priority with
per-carrier validity, exact-cent price parsing, first-in-doc-order
picks, and the no-carrier row-drop contract."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-offers-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _offers(spark, pages):
    from hickoryspark.ops.offers import product_offers
    from hickoryspark.spark.nodes_table import explode_nodes

    df = spark.createDataFrame(pages, "url string, html string")
    return {r["url"]: r for r in
            product_offers(explode_nodes(df)).collect()}


LD = '<script type="application/ld+json">'


def test_carrier_priority_and_fallthrough(spark):
    out = _offers(spark, [
        # JSON-LD Product wins over meta
        ("u1",
         "<html><head>"
         '<meta property="og:title" content="MetaName">'
         '<meta property="product:price:amount" content="5">'
         "</head><body>"
         + LD + '{"@type":"Product","name":"LdName",'
         '"offers":{"price":"12.99","priceCurrency":"USD",'
         '"availability":"InStock"}}</script></body></html>'),
        # invalid JSON-LD price falls through to meta
        ("u2",
         "<html><head>"
         '<meta property="og:title" content="M2">'
         '<meta property="og:price:amount" content="7.5">'
         '<meta property="og:price:currency" content="EUR">'
         "</head><body>"
         + LD + '{"@type":"Product","name":"Bad",'
         '"offers":{"price":"N/A"}}</script></body></html>'),
        # non-Product JSON-LD ignored; no meta price -> no row
        ("u3",
         "<html><body>" + LD +
         '{"@type":"Article","name":"A"}</script></body></html>'),
    ])
    assert out["u1"]["offer_source"] == "jsonld"
    assert out["u1"]["name"] == "LdName"
    assert out["u1"]["price_cents"] == 1299
    assert out["u1"]["currency"] == "USD"
    assert out["u1"]["availability"] == "InStock"
    assert out["u2"]["offer_source"] == "meta"
    assert out["u2"]["name"] == "M2"
    assert out["u2"]["price_cents"] == 750
    assert out["u2"]["currency"] == "EUR"
    assert out["u2"]["availability"] is None
    assert "u3" not in out


def test_first_valid_product_block_wins(spark):
    out = _offers(spark, [
        ("u1",
         "<html><body>"
         + LD + '{"@type":"WebSite","name":"S"}</script>'
         + LD + '{"@type":"Product","name":"First",'
         '"offers":{"price":"1"}}</script>'
         + LD + '{"@type":"Product","name":"Second",'
         '"offers":{"price":"2"}}</script></body></html>'),
    ])
    assert out["u1"]["name"] == "First"
    assert out["u1"]["price_cents"] == 100


def test_price_cents_exactness(spark):
    # textual split/pad — the 1.005-style float trap cannot occur
    from pyspark.sql import functions as F

    from hickoryspark.ops.offers import price_cents

    df = spark.range(1).select(
        *[price_cents(F.lit(s)).alias(f"c{i}") for i, s in enumerate(
            ["10", "10.5", "10.55", "0.07", "1.005", "-3", "3.", "x",
             "12345678901234"])]
    )
    r = df.collect()[0]
    assert [r[f"c{i}"] for i in range(9)] == [
        1000, 1050, 1055, 7, None, None, None, None, None]


def test_price_rejects_trailing_newline(spark):
    # \z anchoring: Java $ would accept '12.34\n' (review finding)
    from pyspark.sql import functions as F

    from hickoryspark.ops.offers import price_cents

    r = spark.range(1).select(
        price_cents(F.lit("12.34\n")).alias("a"),
        price_cents(F.lit("\n12.34")).alias("b"),
        price_cents(F.lit("12.34")).alias("c"),
    ).collect()[0]
    assert r["a"] is None and r["b"] is None and r["c"] == 1234


def test_price_cents_fuzz_vs_decimal():
    # INDEPENDENT oracle: Decimal string parsing scaled to cents
    import random
    from decimal import Decimal, InvalidOperation

    import sys as _sys

    _sys.path.insert(0, ".")
    from hickoryspark.spark.session import get_spark

    from pyspark.sql import functions as F

    from hickoryspark.ops.offers import price_cents

    rng = random.Random(7)
    pool = "0123456789.x -\n"
    cases = ["".join(rng.choice(pool) for _ in range(rng.randint(1, 10)))
             for _ in range(200)] + ["7", "7.1", "7.12", "7.123", ""]
    spark = get_spark(4, app_name="offers-fuzz", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame([(c,) for c in cases], "s string").withColumn(
        "c", price_cents(F.col("s")))
    for r in df.collect():
        s = r["s"]
        want = None
        # the pinned contract: plain decimal, <=13 integer digits,
        # <=2 fraction digits, no sign, no exponent, nothing else
        import re
        if re.fullmatch(r"[0-9]{1,13}(\.[0-9]{1,2})?", s):
            want = int((Decimal(s) * 100).to_integral_value())
        assert r["c"] == want, repr(s)
