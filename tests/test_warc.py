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
