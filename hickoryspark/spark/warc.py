"""WARC source: read Common-Crawl-style WARC files into the ``pages``
relation.

WARC (ISO 28500) is the archive format the design-scale corpus arrives
in. The reader is a from-scratch record parser (no warcio dependency):

- ``spark.read.format("binaryFile")`` lists the ``*.warc`` /
  ``*.warc.gz`` files; each file becomes one task that parses its
  records inside ``mapInPandas`` — parallelism = number of archive
  files, which matches Common Crawl's layout (~1 GB per file,
  thousands of files per crawl).
- Only ``WARC-Type: response`` records yield rows; the HTTP header
  block is stripped so ``html`` is the raw payload body.
- ``url`` ← WARC-Target-URI, ``warc_ts`` ← WARC-Date (ISO 8601).
- Whole-file gzip is handled (member-per-record gzip concatenations
  decompress identically through ``gzip.decompress`` since Python
  reads all members).

The writer half (``warc_bytes``) emits spec-shaped records — used to
build deterministic fixtures, and as the archival sink direction.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = "url string, warc_ts timestamp, html binary"

_CRLF = b"\r\n"


def warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    """Serialize (url, iso_date, payload) triples as WARC 1.0 response
    records (with the HTTP response envelope a crawler would store)."""
    out = []
    for url, iso_date, payload in records:
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html; charset=UTF-8" + _CRLF
            + f"Content-Length: {len(payload)}".encode() + _CRLF
            + _CRLF
            + payload
        )
        header = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: response" + _CRLF
            + f"WARC-Target-URI: {url}".encode() + _CRLF
            + f"WARC-Date: {iso_date}".encode() + _CRLF
            + b"Content-Type: application/http; msgtype=response" + _CRLF
            + f"Content-Length: {len(http)}".encode() + _CRLF
            + _CRLF
        )
        out.append(header + http + _CRLF + _CRLF)
    return b"".join(out)


def _find_record_boundary(data: bytes, start: int) -> int:
    """First offset after ``start`` that plausibly begins a WARC
    record: preceded by CRLFCRLF, version line is ``WARC/<d>.<d>``,
    and the candidate's own header block (bounded, within 64 KiB)
    contains a numeric Content-Length. Returns -1 if none. Used only
    on the malformed-record resync path."""
    search = start
    while True:
        nxt = data.find(_CRLF + _CRLF + b"WARC/", search)
        if nxt == -1:
            return -1
        cand = nxt + 4
        ver_end = data.find(_CRLF, cand)
        ver = data[cand:ver_end] if ver_end != -1 else b""
        # b'WARC/1.0' / b'WARC/1.1' — reject prose like 'WARC/ files'
        ok_ver = (
            len(ver) == 8
            and ver[:5] == b"WARC/"
            and ver[5:6].isdigit()
            and ver[6:7] == b"."
            and ver[7:8].isdigit()
        )
        if ok_ver:
            hdr_end = data.find(_CRLF + _CRLF, cand, cand + 65536)
            if hdr_end != -1:
                for line in data[cand:hdr_end].split(_CRLF)[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-length" and \
                            v.strip().isdigit():
                        return cand
        search = nxt + 4
        if search >= len(data):
            return -1


def parse_warc_records(data: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, iso_date, html_payload) from raw WARC bytes.

    Tolerant, offset-driven parse: records are located by their
    ``WARC/`` version line and sized by the mandatory Content-Length
    header, so on well-formed archives a payload containing 'WARC/1.0'
    text cannot confuse the scan (it is skipped over by length, never
    scanned). Only after a MALFORMED Content-Length does the parser
    fall back to scanning for the next record boundary — and every
    candidate is validated (version line parses, its header block
    carries a numeric Content-Length) before being committed, so
    boundary-shaped payload text inside the damaged region is stepped
    over rather than yielding pseudo-records. Non-response records are
    skipped.
    """
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end == -1:
            return
        header = data[pos:hdr_end].decode("utf-8", "replace")
        fields = {}
        for line in header.split("\r\n")[1:]:  # [0] is the version line
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            # Malformed/missing Content-Length: real Common-Crawl
            # archives contain dirty records, and bailing out here
            # would silently drop every record after the bad one.
            # Resync at the next VALIDATED record boundary (blank line
            # + a version line whose header block parses with a
            # numeric Content-Length) — an unvalidated scan can lock
            # onto 'WARC/' text inside the damaged record's payload
            # (e.g. an archived page discussing WARC).
            nxt = _find_record_boundary(data, hdr_end)
            if nxt == -1:
                return
            pos = nxt
            continue
        body_start = hdr_end + 4
        body = data[body_start : body_start + length]
        pos = body_start + length
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri", "")
        date = fields.get("warc-date", "")
        # strip the stored HTTP envelope: payload begins after its
        # header block
        http_end = body.find(_CRLF + _CRLF)
        payload = body[http_end + 4 :] if http_end != -1 else body
        yield url, date, payload


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files at ``path`` (glob ok) → DataFrame(url, warc_ts, html).

    One task per archive file; decompression + record parsing happen
    executor-side inside the Arrow batch generator.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import gzip

        for b in batches:
            for path_, content in zip(b["path"], b["content"]):
                data = bytes(content)
                if path_.endswith(".gz"):
                    data = gzip.decompress(data)
                urls, tss, payloads = [], [], []
                for url, date, payload in parse_warc_records(data):
                    urls.append(url)
                    try:
                        ts = pd.Timestamp(date)  # parse once — ingest hot loop
                        if ts.tzinfo is not None:
                            ts = ts.tz_convert("UTC").tz_localize(None)
                    except ValueError:
                        # absent/garbled WARC-Date: keep the record
                        # (payload is the point), NULL the timestamp —
                        # matches the parser's documented tolerance
                        ts = pd.NaT
                    tss.append(ts)
                    payloads.append(payload)
                yield pd.DataFrame(
                    {"url": urls, "warc_ts": tss, "html": payloads}
                )

    return files.mapInPandas(gen, WARC_SCHEMA)
