"""Product/offer extraction — the e-commerce catalog primitive
(shopping-feed builders, price-comparison crawlers, structured-result
SERPs all consume exactly this): one offer row per page from the two
carriers real shops publish, merged by pinned priority.

Carriers and priority (the publish_dates rule — validity is decided
PER CARRIER before the priority pick, so a broken high-priority
carrier falls through instead of shadowing a good one):

1. ``jsonld`` — the first (document order) ``application/ld+json``
   block whose ``@type`` is ``Product`` and whose ``offers.price``
   parses as a plain decimal; fields ``name``, ``offers.price``,
   ``offers.priceCurrency``, ``offers.availability``.
2. ``meta`` — OpenGraph commerce tags: price from the first
   ``product:price:amount`` or ``og:price:amount`` meta content that
   parses, currency from ``product:price:currency`` /
   ``og:price:currency``, name from ``og:title``, availability from
   ``og:availability``.

Money is exact integer cents (``price_cents``): the price string must
match ``^[0-9]{1,13}(\\.[0-9]{1,2})?$`` and is split/padded
textually — NEVER parsed as a float and multiplied (the crawl-delay
lesson: 1.005 * 100 is 100.49999... in IEEE; text slicing gives 100
cents + 50 per half-written digit deterministically).

Scale shape: the JSON-LD carrier rides ``extract_jsonld`` (url-local
equi-join + one url window, JVM Jackson fields); the meta carrier is
ONE pruned url groupBy of min-struct first-in-doc-order picks (the
page_metadata pattern); the merge is a url full-outer join of two
per-url frames. No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT

__all__ = ["product_offers", "PRICE_RE"]

#: \A..\z, never ^..$ — Java's $ matches before a trailing newline
#: (the cross-dialect anchoring rule), and a strict money validator
#: must reject '12.34\n'
PRICE_RE = r"\A([0-9]{1,13})(\.([0-9]{1,2}))?\z"


def price_cents(col: Column) -> Column:
    """Exact integer cents from a plain-decimal string; NULL when the
    string does not match :data:`PRICE_RE`."""
    whole = F.regexp_extract(col, PRICE_RE, 1)
    frac = F.regexp_extract(col, PRICE_RE, 3)
    return F.when(
        col.rlike(PRICE_RE),
        whole.cast("long") * 100 + F.rpad(frac, 2, "0").cast("long"),
    )


_JSONLD_OFFER_FIELDS = {
    "ld_type": "$['@type']",
    "ld_name": "$.name",
    "ld_price": "$['offers'].price",
    "ld_currency": "$['offers'].priceCurrency",
    "ld_availability": "$['offers'].availability",
}


def product_offers(nodes: DataFrame) -> DataFrame:
    """Node table -> (url, name, price_cents, currency, availability,
    offer_source); pages with no valid-price carrier emit no row."""
    from hickoryspark.ops.structured import extract_jsonld

    ld = (
        extract_jsonld(nodes, _JSONLD_OFFER_FIELDS)
        .where(
            (F.col("ld_type") == "Product")
            & price_cents(F.col("ld_price")).isNotNull()
        )
        .groupBy("url")
        .agg(
            F.min(
                F.struct(
                    "script_pos",
                    F.col("ld_name").alias("name"),
                    price_cents(F.col("ld_price")).alias("price_cents"),
                    F.col("ld_currency").alias("currency"),
                    F.col("ld_availability").alias("availability"),
                )
            ).alias("_ld")
        )
        .select(
            "url",
            F.col("_ld.name").alias("ld_name"),
            F.col("_ld.price_cents").alias("ld_price_cents"),
            F.col("_ld.currency").alias("ld_currency"),
            F.col("_ld.availability").alias("ld_availability"),
        )
    )

    a = F.col("attrs")
    prop = F.lower(F.coalesce(a["property"], F.lit("")))
    content = a["content"]
    is_meta = (F.col("type") == TYPE_ELEMENT) & (F.col("tag") == "meta")

    def first(cond, val):
        return F.min(F.when(cond & val.isNotNull(),
                            F.struct(F.col("pre_ord"), val.alias("v"))))["v"]

    amount = first(
        is_meta
        & prop.isin("product:price:amount", "og:price:amount")
        & price_cents(content).isNotNull(),
        content,
    )
    meta = nodes.groupBy("url").agg(
        price_cents(amount).alias("m_price_cents"),
        first(
            is_meta & prop.isin("product:price:currency",
                                "og:price:currency"),
            content,
        ).alias("m_currency"),
        first(is_meta & (prop == "og:title"), content).alias("m_name"),
        first(is_meta & (prop == "og:availability"), content).alias(
            "m_availability"
        ),
    ).where(F.col("m_price_cents").isNotNull())

    merged = ld.join(meta, "url", "full_outer")
    use_ld = F.col("ld_price_cents").isNotNull()
    return merged.select(
        "url",
        F.when(use_ld, F.col("ld_name")).otherwise(F.col("m_name"))
        .alias("name"),
        F.when(use_ld, F.col("ld_price_cents"))
        .otherwise(F.col("m_price_cents")).alias("price_cents"),
        F.when(use_ld, F.col("ld_currency")).otherwise(F.col("m_currency"))
        .alias("currency"),
        F.when(use_ld, F.col("ld_availability"))
        .otherwise(F.col("m_availability")).alias("availability"),
        F.when(use_ld, F.lit("jsonld")).otherwise(F.lit("meta"))
        .alias("offer_source"),
    )
