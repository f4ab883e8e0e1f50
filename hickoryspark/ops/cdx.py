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


def cdx_dedup(cdx: DataFrame) -> DataFrame:
    """Web-archive revisit dedup over CDX rows: one row per
    (surt_key, digest) with the ORIGINAL capture's timestamp and the
    revisit count — the aggregation behind WARC ``revisit`` records
    (identical-digest recaptures store a pointer, not the payload;
    WARC 1.1 §6.7.2). Storage saved = sum over rows of
    (n_captures - 1) * length.

    Pinned: the original is the ts14-minimum capture (ts14 is
    zero-padded UTC, so string min == time min); ``n_captures``
    counts all identical-digest captures of the same SURT key;
    NULL-digest captures (payload-less fetches — cdx_records pins
    NULL payload → NULL digest) are EXCLUDED: a revisit record
    requires a matching digest, and grouping unknowns together would
    claim dedup of payloads that were never compared.

    Scale shape: ONE map-side-combinable (surt_key, digest) groupBy —
    no window, no self-join (the CDX writer's global sort is the
    writer's job, ops/cdx.cdx_records docstring)."""
    return (
        cdx.where(F.col("digest").isNotNull())
        .groupBy("surt_key", "digest")
        .agg(
            F.min("ts14").alias("first_ts14"),
            F.count(F.lit(1)).cast("long").alias("n_captures"),
            F.max("length").cast("long").alias("length"),
        )
    )
