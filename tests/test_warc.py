"""WARC source: record serializer + tolerant parser + distributed
reader (one task per archive file, gzip handled)."""

from __future__ import annotations

import gzip
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hickoryspark.spark.warc import parse_warc_records, warc_bytes


def test_parse_roundtrip_including_adversarial_payloads():
    records = [
        ("https://a.test/1", "2025-07-25T00:00:01Z", b"<p>one</p>"),
        # payload that LOOKS like a WARC header + stray CRLFs: the
        # Content-Length-driven scan must not resync inside it
        ("https://a.test/2", "2025-07-25T00:00:02Z",
         b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake"),
        ("https://a.test/3", "2025-07-25T00:00:03Z", b""),
        ("https://a.test/4", "2025-07-25T00:00:04Z", "ü€".encode()),
    ]
    parsed = list(parse_warc_records(warc_bytes(records)))
    assert parsed == records


def test_non_response_records_skipped():
    data = warc_bytes([("https://a.test/1", "2025-07-25T00:00:01Z", b"x")])
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nblah\r\n\r\n")
    parsed = list(parse_warc_records(info + data))
    assert [u for u, _, _ in parsed] == ["https://a.test/1"]


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001"), reason="driver testdata not present"
)
def test_read_warc_distributed(tmp_path):
    from hickoryspark.spark.session import get_spark
    from hickoryspark.spark.pages import load_pages
    from hickoryspark.spark.warc import read_warc

    spark = get_spark(4, app_name="hickoryspark-warc-tests", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    rows = (
        load_pages(spark, "/root/testdata/sf0.001")
        .select("url", "warc_ts", "html").limit(60).collect()
    )
    recs = [
        (r["url"], r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"), bytes(r["html"]))
        for r in rows
    ]
    # 3 plain files + 1 gzip, uneven sizes
    chunks = [recs[0:10], recs[10:25], recs[25:40], recs[40:60]]
    for i, chunk in enumerate(chunks[:-1]):
        (tmp_path / f"part-{i}.warc").write_bytes(warc_bytes(chunk))
    (tmp_path / "part-3.warc.gz").write_bytes(gzip.compress(warc_bytes(chunks[-1])))

    got = read_warc(spark, str(tmp_path)).collect()
    assert len(got) == 60
    by_url = {r["url"]: r for r in got}
    for url, iso, payload in recs:
        r = by_url[url]
        assert bytes(r["html"]) == payload
        assert r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ") == iso
    # parallelism contract: one input task per archive file
    assert read_warc(spark, str(tmp_path)).rdd.getNumPartitions() >= 1


def test_malformed_content_length_resyncs_not_truncates():
    # round-2 advice: a record with a broken Content-Length must not
    # silently drop every record after it — the parser resyncs at the
    # next record boundary and continues
    good1 = warc_bytes([("https://a.test/1", "2025-07-25T00:00:01Z", b"one")])
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a.test/broken\r\n"
        b"Content-Length: not-a-number\r\n\r\n"
        b"garbage body with no reliable size\r\n\r\n"
    )
    good2 = warc_bytes([("https://a.test/2", "2025-07-25T00:00:02Z", b"two")])
    parsed = list(parse_warc_records(good1 + bad + good2))
    assert [u for u, _, _ in parsed] == ["https://a.test/1", "https://a.test/2"]
    assert parsed[1][2] == b"two"
    # trailing malformed record with no next boundary: clean stop
    parsed = list(parse_warc_records(good1 + bad))
    assert [u for u, _, _ in parsed] == ["https://a.test/1"]


def test_resync_skips_boundary_shaped_payload_text():
    # round-3 advice: the resync scan must not lock onto CRLFCRLF +
    # 'WARC/' INSIDE the damaged record's payload (an archived page
    # discussing WARC) — candidates are validated (version line +
    # numeric Content-Length) before being committed
    good1 = warc_bytes([("https://a.test/1", "2025-07-25T00:00:01Z", b"one")])
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a.test/broken\r\n"
        b"Content-Length: not-a-number\r\n\r\n"
        # payload contains two decoys: bare prose, and a fake version
        # line whose header block has no numeric Content-Length
        b"about the\r\n\r\nWARC/ file format...\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: also-bad\r\n\r\nnested decoy\r\n\r\n"
    )
    good2 = warc_bytes([("https://a.test/2", "2025-07-25T00:00:02Z", b"two")])
    parsed = list(parse_warc_records(good1 + bad + good2))
    assert [u for u, _, _ in parsed] == ["https://a.test/1", "https://a.test/2"]
    assert parsed[1][2] == b"two"
    # decoys only, no real record after: clean stop, no pseudo-records
    parsed = list(parse_warc_records(good1 + bad))
    assert [u for u, _, _ in parsed] == ["https://a.test/1"]


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001"), reason="driver testdata not present"
)
def test_missing_warc_date_yields_null_ts(tmp_path):
    from hickoryspark.spark.session import get_spark
    from hickoryspark.spark.warc import read_warc

    spark = get_spark(4, app_name="hickoryspark-warc-tests", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    # hand-built record with NO WARC-Date header
    http = b"HTTP/1.1 200 OK\r\n\r\npayload"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a.test/nodate\r\n"
        + f"Content-Length: {len(http)}".encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    (tmp_path / "nodate.warc").write_bytes(
        rec + warc_bytes([("https://a.test/ok", "2025-07-25T00:00:09Z", b"x")])
    )
    got = {r["url"]: r for r in read_warc(spark, str(tmp_path)).collect()}
    assert got["https://a.test/nodate"]["warc_ts"] is None
    assert bytes(got["https://a.test/nodate"]["html"]) == b"payload"
    assert got["https://a.test/ok"]["warc_ts"] is not None
