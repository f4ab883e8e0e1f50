"""CDX capture-index records — the web-archive lookup index.

Every WARC-based archive pipeline (Common Crawl, IA-style wayback
stacks) materializes a CDX(J) index over its captures: the SURT-sorted
relation ``(surt_key, timestamp14, url, digest, mime, status,
length)`` that makes by-URL lookup and prefix scans possible. This op
composes the repo's own building blocks — ops/urls.surt, ops/mime
sniffing, WARC payloads — into that relation. The reference engine has
no equivalent; net-new surface like ops/warc.py.

Pinned semantics (oracle-reproducible):

- ``surt_key`` = ops/urls.surt(url) (compose with normalize_url
  upstream when fold-before-key is wanted — same contract as surt);
- ``ts14`` = the capture timestamp formatted ``yyyyMMddHHmmss``; pass
  an NTZ timestamp column — NTZ formatting is tz-independent (the
  events_windowed lesson; a tz-aware column would silently shift with
  the session zone);
- ``digest`` = lowercase md5 hex of the payload bytes (classic CDX
  uses sha1-base32; md5 is pinned here because both engines share it
  byte-exactly — documented deviation);
- ``mime`` = ops/mime.sniff_mime(payload) (the WHATWG sniffer — never
  trusts a Content-Type header it isn't given);
- ``status`` passthrough (default 200 when absent), ``length`` =
  payload byte count; NULL payload → NULL digest/mime and length 0.

The output is NOT pre-sorted: index writers sort by (surt_key, ts14)
at write time (``sortWithinPartitions`` after a range partition on
surt_key — sorting here would force a global sort on every caller).

Scale shape: pure column expressions over the captures scan — no
shuffle, no Python; the sniffer is one rlike chain (whole-stage
codegen with real binary columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.mime import sniff_mime
from hickoryspark.ops.urls import surt

__all__ = ["cdx_records"]


def cdx_records(captures: DataFrame, url_col: str = "url",
                ts_col: str = "ts", payload_col: str = "payload",
                status_col: str | None = None) -> DataFrame:
    """Captures -> CDX rows ``(surt_key, ts14, url, digest, mime,
    status, length)``."""
    payload = F.col(payload_col)
    status = (
        F.col(status_col).cast("long") if status_col
        else F.lit(200).cast("long")
    )
    return captures.select(
        surt(F.col(url_col)).alias("surt_key"),
        F.date_format(F.col(ts_col), "yyyyMMddHHmmss").alias("ts14"),
        F.col(url_col).alias("url"),
        F.md5(payload).alias("digest"),
        sniff_mime(payload).alias("mime"),
        status.alias("status"),
        F.coalesce(F.octet_length(payload), F.lit(0)).cast("long")
        .alias("length"),
    )
