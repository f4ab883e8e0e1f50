"""Publication-date extraction — the freshness signal every crawl
scheduler and training-data curator needs (date-based corpus slicing,
dedup tie-breaking toward the earliest copy, recency weighting).

The reference engine has no date layer; this extends the §2 surface
over the node table (hickoryspark/spark/nodes_table.py) the way
ops/metadata.py does, with a pinned carrier priority mirroring how
real pages declare publication time:

1. ``meta property="article:published_time"`` content (the Open Graph
   article extension — the most explicit declaration);
2. JSON-LD ``datePublished`` (top-level key of an
   ``application/ld+json`` block);
3. ``<time datetime="...">`` (the HTML-native carrier);
4. a ``/YYYY/MM/DD/`` (or ``/YYYY/MM/``) path segment in the URL —
   the blog-permalink fallback when the markup declares nothing.

Pinned semantics (oracle-reproducible):

- a candidate VALUE is valid iff, after ASCII-whitespace trim, it
  starts with a plausible ISO date ``YYYY-MM-DD`` (month 01-12, day
  01-31); ``published`` is that 10-char prefix (time-of-day and zone
  are dropped — this is a date signal, not a timestamp parse);
- an INVALID higher-priority candidate falls through (validity is
  filtered BEFORE the priority pick, so a broken meta tag never
  shadows a good ``<time>``);
- within one priority, first in document order wins;
- the URL fallback requires a 4-digit year 1900-2099 and a plausible
  month; a missing day pins day 01;
- every url in the node table keeps exactly one output row;
  ``published`` is NULL and ``date_source`` is ``''`` when no carrier
  yields a valid date.

Scale shape: the three markup carriers are tiny after their element
filters (filter-below-exchange, the page_metadata pattern); JSON-LD
payloads attach via ONE url-local equi-join (script element ↔ its
text child); the priority pick is a single min-struct groupBy on url
— no windows, no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT
from hickoryspark.ops.structured import JSONLD_MIME, _ASCII_WS_CHARS

__all__ = ["publish_dates", "ISO_DATE_PREFIX_RE", "URL_DATE_RE"]

#: plausible ISO-date prefix (anchored; applied to the trimmed value)
ISO_DATE_PREFIX_RE = r"^(\d{4}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12]\d|3[01]))"

#: /YYYY/MM[/DD] path segment (year 1900-2099; day optional); the
#: terminator accepts '/', '?', '#', or end-of-string (a permalink
#: with tracking params keeps its day) — \z, never $ (cross-dialect
#: rule)
URL_DATE_RE = (
    r"/((?:19|20)\d{2})/(0[1-9]|1[0-2])(?:/(0[1-9]|[12]\d|3[01]))?"
    r"(?:[/?#]|\z)"
)


def _valid_date(raw: Column) -> Column:
    """10-char ISO date prefix of the trimmed value, NULL if invalid."""
    v = F.regexp_extract(
        F.btrim(raw, F.lit(_ASCII_WS_CHARS)), ISO_DATE_PREFIX_RE, 1)
    return F.when(v != "", v)


def publish_dates(nodes: DataFrame) -> DataFrame:
    """node table → ``(url, published, date_source)`` under the pinned
    carrier priority; one row per url."""
    a = F.col("attrs")
    elems = nodes.where(F.col("type") == TYPE_ELEMENT)

    meta = elems.where(
        (F.col("tag") == "meta")
        & (F.lower(F.btrim(F.coalesce(a["property"], F.lit("")),
                           F.lit(_ASCII_WS_CHARS)))
           == "article:published_time")
    ).select(
        "url", F.lit(1).alias("prio"), "pre_ord",
        F.lit("meta").alias("src"), _valid_date(a["content"]).alias("d"),
    )

    scripts = elems.where(
        (F.col("tag") == "script")
        & (F.lower(F.btrim(F.coalesce(a["type"], F.lit("")),
                           F.lit(_ASCII_WS_CHARS))) == JSONLD_MIME)
    ).select("url", F.col("node_id").alias("script_id"), "pre_ord")
    payloads = nodes.where(
        (F.col("type") == TYPE_TEXT)
        & (F.col("parent_type") == TYPE_ELEMENT)
        & (F.col("parent_tag") == "script")
    ).select("url", F.col("parent_id").alias("script_id"),
             F.col("text").alias("raw_json"))
    jsonld = scripts.join(payloads, ["url", "script_id"]).select(
        "url", F.lit(2).alias("prio"), "pre_ord",
        F.lit("jsonld").alias("src"),
        _valid_date(
            F.get_json_object("raw_json", "$.datePublished")).alias("d"),
    )

    time_el = elems.where(F.col("tag") == "time").select(
        "url", F.lit(3).alias("prio"), "pre_ord",
        F.lit("time").alias("src"), _valid_date(a["datetime"]).alias("d"),
    )

    cands = meta.unionByName(jsonld).unionByName(time_el).where(
        F.col("d").isNotNull())
    picked = cands.groupBy("url").agg(
        F.min(F.struct("prio", "pre_ord", "src", "d")).alias("_p"))

    # node_id == 0 is the document root — exactly one row per url,
    # no distinct aggregation needed
    base = nodes.where(F.col("node_id") == 0).select("url")
    out = base.join(picked, "url", "left")
    # run the url regex ONCE per row (group 0), then slice the
    # fixed-format match: '/YYYY/MM' is positions 2-5 / 7-8, a day is
    # present iff position 9 is '/' and two day digits follow (the
    # regex admits nothing else there)
    out = out.withColumn(
        "_m0", F.regexp_extract("url", URL_DATE_RE, 0))
    m0 = F.col("_m0")
    dd = F.when(
        F.substring(m0, 9, 1) == "/", F.substring(m0, 10, 2)
    ).otherwise(F.lit(""))
    url_date = F.concat(
        F.substring(m0, 2, 4), F.lit("-"), F.substring(m0, 7, 2),
        F.lit("-"), F.when(dd != "", dd).otherwise(F.lit("01")))
    published = F.coalesce(
        F.col("_p.d"), F.when(m0 != "", url_date))
    source = (
        F.when(F.col("_p.src").isNotNull(), F.col("_p.src"))
        .when(m0 != "", F.lit("url"))
        .otherwise(F.lit(""))
    )
    return out.select(
        "url", published.alias("published"), source.alias("date_source"))


# ---------------------------------------------------------------------------
# In-text temporal mentions

#: \b-delimited ISO form; \b (not lookaround — RE2 has none) so a
#: digit-run prefix/suffix disqualifies but punctuation delimits.
MENTION_ISO_RE = r"\b(\d{4})-(\d{2})-(\d{2})\b"

_MONTHS = ("January", "February", "March", "April", "May", "June",
           "July", "August", "September", "October", "November",
           "December")

#: English long form "Month d, yyyy"
MENTION_LONG_RE = (
    r"\b(" + "|".join(_MONTHS) + r") (\d{1,2}), (\d{4})\b"
)


def _cal_valid(y: Column, m: Column, d: Column) -> Column:
    """Full calendar validity incl. month lengths and the Gregorian
    leap rule (y%4 == 0 and (y%100 != 0 or y%400 == 0))."""
    leap = (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))
    days = (
        F.when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
        .when(m.isin(4, 6, 9, 11), 30)
        .otherwise(F.when(leap, 29).otherwise(28))
    )
    return (m >= 1) & (m <= 12) & (d >= 1) & (d <= days)


def _month_num(name: Column) -> Column:
    out = F.lit(None).cast("int")
    for i, mn in enumerate(_MONTHS, start=1):
        out = F.when(name == mn, i).otherwise(out)
    return out


def date_mentions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) -> (doc_id, raw, iso): every in-text date
    mention in ISO (``2024-03-15``) or English long form
    (``March 15, 2024``), normalized to ``yyyy-mm-dd`` and filtered
    by FULL calendar validity (month lengths + leap years — unlike
    the metadata-carrier path, body text is noisy enough that
    ``2023-02-29`` and ``April 31`` appear and must drop). One output
    row per OCCURRENCE (multiplicity preserved, document order not).

    Both regexes are in the Java-regex ∩ RE2 subset (``\\b``, no
    lookaround — the sentences-op rule), so the DuckDB mirror matches
    byte-for-byte. Scale shape: two regexp_extract_all passes +
    explode, all JVM-side, shuffle-free.
    """
    did = F.col("doc_id")
    text = F.col(text_col)

    # Column-native regexp_extract_all: an F.expr SQL literal would
    # re-interpret the pattern's backslashes (Spark SQL C-escapes)
    iso_raw = docs.select(
        did,
        F.explode(
            F.regexp_extract_all(text, F.lit(MENTION_ISO_RE), F.lit(0))
        ).alias("raw"),
    )
    y1 = F.regexp_extract("raw", MENTION_ISO_RE, 1).cast("int")
    m1 = F.regexp_extract("raw", MENTION_ISO_RE, 2).cast("int")
    d1 = F.regexp_extract("raw", MENTION_ISO_RE, 3).cast("int")
    iso_rows = iso_raw.where(_cal_valid(y1, m1, d1)).select(
        "doc_id", "raw", F.col("raw").alias("iso")
    )

    long_raw = docs.select(
        did,
        F.explode(
            F.regexp_extract_all(text, F.lit(MENTION_LONG_RE), F.lit(0))
        ).alias("raw"),
    )
    mon = _month_num(F.regexp_extract("raw", MENTION_LONG_RE, 1))
    d2 = F.regexp_extract("raw", MENTION_LONG_RE, 2).cast("int")
    y2 = F.regexp_extract("raw", MENTION_LONG_RE, 3).cast("int")
    long_rows = long_raw.where(_cal_valid(y2, mon, d2)).select(
        "doc_id",
        "raw",
        F.concat(
            F.lpad(y2.cast("string"), 4, "0"),
            F.lit("-"),
            F.lpad(mon.cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad(d2.cast("string"), 2, "0"),
        ).alias("iso"),
    )
    return iso_rows.unionByName(long_rows)
