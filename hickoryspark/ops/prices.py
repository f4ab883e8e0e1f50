"""Price mention extraction — currency-tagged amounts in exact
integer minor units (cents). The commerce-corpus miner (product-page
training data, price-history monitors) and a classic structured-fact
carrier when microdata/JSON-LD offers are absent.

Pinned dialect (the oracle reproduces it; en-US number format only —
``1.234,56``-style locales are out of scope, documented):

- a MENTION is ``(USD|EUR|GBP|[$€£])`` + optional single space +
  ``[0-9]{1,12}(,[0-9]{3}){0,3}(\\.[0-9]{1,2})?`` — bounded digits so
  the minor-unit BIGINT can never overflow; the alternation's
  branches share no first character, so leftmost-first vs
  leftmost-longest can never diverge (the pii.py rule);
- symbols normalize ``$``→USD, ``€``→EUR, ``£``→GBP;
- ``amount_minor`` = integer part (commas stripped) × 100 + the
  fraction right-padded to two digits (``.5`` → 50);
- matches are non-overlapping left-to-right (both engines scan
  identically); ``price_pos`` is the 1-based match index;
- docs with no mention yield no rows.

Scale shape: one regexp_extract_all + posexplode + pure column
parsing — shuffle-free, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_prices", "duckdb_prices_sql", "PRICE_RE"]

#: Java ∩ RE2: explicit classes, bounded repetition, no $/lookaround
PRICE_RE = (
    "(USD|EUR|GBP|[$€£]) ?"
    "[0-9]{1,12}(,[0-9]{3}){0,3}(\\.[0-9]{1,2})?"
)

_CUR_RE = "^(USD|EUR|GBP|[$€£])"


def extract_prices(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, <text_col>, ...) ->
    ``(doc_id, price_pos, currency, amount_minor, raw)``."""
    # native function, NOT F.expr — the SQL parser would eat the
    # backslash in '\.' (unrecognized escapes drop the backslash)
    matches = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(PRICE_RE), F.lit(0))
    ex = docs.select(
        "doc_id", F.posexplode(matches).alias("_i", "raw"))
    cur = F.regexp_extract("raw", _CUR_RE, 1)
    rest = F.regexp_replace("raw", _CUR_RE + " ?", "")
    nc = F.replace(F.col("_rest"), F.lit(","), F.lit(""))
    return (
        ex.withColumn("_rest", rest)
        .withColumn("_nc", nc)
        .withColumn("_ip", F.split("_nc", "[.]").getItem(0))
        .withColumn(
            "_fr",
            F.rpad(F.coalesce(F.try_element_at(F.split("_nc", "[.]"),
                                               F.lit(2)),
                              F.lit("0")), 2, "0"),
        )
        .select(
            "doc_id",
            (F.col("_i") + 1).cast("long").alias("price_pos"),
            F.when(cur == "$", "USD").when(cur == "€", "EUR")
            .when(cur == "£", "GBP").otherwise(cur).alias("currency"),
            (F.col("_ip").cast("long") * 100 + F.col("_fr").cast("long"))
            .alias("amount_minor"),
            "raw",
        )
    )


def duckdb_prices_sql(rel: str, text_expr: str = "text") -> str:
    """Exact DuckDB mirror (same pattern, same parsing arithmetic)."""
    return f"""
        WITH l AS (
          SELECT doc_id,
                 regexp_extract_all(COALESCE({text_expr}, ''),
                                    '{PRICE_RE}') AS ms
          FROM {rel}
        ), e AS (
          SELECT doc_id, CAST(i AS BIGINT) AS price_pos, ms[i] AS raw
          FROM l, unnest(range(1, len(ms) + 1)) AS u(i)
        ), p AS (
          SELECT doc_id, price_pos, raw,
                 regexp_extract(raw, '{_CUR_RE}', 1) AS cur,
                 replace(regexp_replace(raw, '{_CUR_RE} ?', ''),
                         ',', '') AS nc
          FROM e
        )
        SELECT doc_id, price_pos,
               CASE cur WHEN '$' THEN 'USD' WHEN '€' THEN 'EUR'
                    WHEN '£' THEN 'GBP' ELSE cur END AS currency,
               CAST(string_split(nc, '.')[1] AS BIGINT) * 100
                 + CAST(rpad(COALESCE(string_split(nc, '.')[2], '0'),
                             2, '0') AS BIGINT) AS amount_minor,
               raw
        FROM p"""
