"""WET conversion records — the Common Crawl plain-text derivative.

Every WARC archive ships a WET sidecar: one ``conversion`` record per
HTML capture holding the extracted plain text with a small header
block (target URI, capture date, length). Training pipelines consume
WET, not WARC — this op composes the repo's north-star extraction
(``spark.extract.extract_pages``) with deterministic record
formatting, the same way ops/cdx.py composes SURT + mime into the
lookup index. The reference engine has no equivalent; net-new surface
like ops/warc.py.

Pinned semantics (oracle-reproducible):

- ``wet_date`` = the capture timestamp formatted ISO-8601 Zulu
  (``yyyy-MM-dd'T'HH:mm:ss'Z'``); pass an NTZ timestamp column — NTZ
  formatting is tz-independent (the events_windowed lesson).
- ``record_id`` = ``urn:md5:`` + md5 hex of ``url + '\\n' + wet_date``
  (the real format mints a random uuid per record; a deterministic id
  is pinned so two engines — and two retries of the same task — mint
  the same record; documented deviation).
- ``content_length`` = OCTET length of the UTF-8 text (WARC
  Content-Length counts bytes, not characters).
- ``record`` = the serialized header block + blank line + text +
  trailing CRLF CRLF, CRLF line ends per the WARC spec.
- NULL text (a page whose extraction failed) keeps its row with NULL
  record/content_length — the caller decides whether failures ship.

Scale shape: pure column expressions over the extracted relation — no
shuffle, no Python beyond whatever produced the text column; writers
concatenate ``record`` per partition (one WET file per task, exactly
the ops/warc.py layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["wet_records", "DUCKDB_WET_RECORD_SQL"]

_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def wet_records(extracted: DataFrame, url_col: str = "url",
                ts_col: str = "ts",
                text_col: str = "main_text") -> DataFrame:
    """Extracted pages -> WET rows ``(url, wet_date, record_id,
    content_length, record)``. ``extracted`` is typically
    ``extract_pages(pages)`` joined with its capture timestamps, but
    any (url, ts, text) relation works."""
    url = F.col(url_col)
    text = F.col(text_col)
    wet_date = F.date_format(F.col(ts_col), _DATE_FMT)
    # F.concat, not concat_ws: a NULL capture date must propagate to a
    # NULL record_id/record exactly as the mirror's '||' does (the
    # WARC reader emits NaT dates on malformed archives)
    record_id = F.concat(
        F.lit("urn:md5:"),
        F.md5(F.concat(url, F.lit("\n"), wet_date)))
    n_bytes = F.octet_length(text).cast("long")
    record = F.concat(
        F.lit("WARC/1.0\r\n"
              "WARC-Type: conversion\r\n"
              "WARC-Target-URI: "), url,
        F.lit("\r\nWARC-Date: "), wet_date,
        F.lit("\r\nWARC-Record-ID: <"), record_id,
        F.lit(">\r\nContent-Type: text/plain\r\n"
              "Content-Length: "), n_bytes.cast("string"),
        F.lit("\r\n\r\n"), text, F.lit("\r\n\r\n"),
    )
    return extracted.select(
        url.alias("url"),
        wet_date.alias("wet_date"),
        record_id.alias("record_id"),
        n_bytes.alias("content_length"),
        record.alias("record"),
    )


#: DuckDB SELECT-list fragment mirroring :func:`wet_records` given SQL
#: expressions for the url, an NTZ timestamp, and the text.
def DUCKDB_WET_RECORD_SQL(url: str, ts: str, text: str) -> str:
    wet_date = f"strftime({ts}, '%Y-%m-%dT%H:%M:%SZ')"
    record_id = f"'urn:md5:' || md5({url} || chr(10) || {wet_date})"
    n_bytes = f"CAST(octet_length(encode({text})) AS BIGINT)"
    crlf = "chr(13) || chr(10)"
    return ", ".join([
        f"{url} AS url",
        f"{wet_date} AS wet_date",
        f"{record_id} AS record_id",
        f"{n_bytes} AS content_length",
        f"'WARC/1.0' || {crlf} || 'WARC-Type: conversion' || {crlf}"
        f" || 'WARC-Target-URI: ' || {url} || {crlf}"
        f" || 'WARC-Date: ' || {wet_date} || {crlf}"
        f" || 'WARC-Record-ID: <' || {record_id} || '>' || {crlf}"
        f" || 'Content-Type: text/plain' || {crlf}"
        f" || 'Content-Length: ' || CAST({n_bytes} AS VARCHAR)"
        f" || {crlf} || {crlf} || {text} || {crlf} || {crlf}"
        f" AS record",
    ])
