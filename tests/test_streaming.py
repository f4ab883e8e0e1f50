"""Structured Streaming path: file-source pages feed -> extraction ->
parquet sink with checkpoint; restart processes only new files.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-stream-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_stream_extract_and_resume(spark, tmp_path):
    from pyspark.sql import functions as F

    from hickoryspark.spark.pages import load_pages
    from hickoryspark.spark.streaming import start_extract_stream

    src = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = load_pages(spark, SF_DIR).cache()
    n = pages.count()
    first = pages.where(F.col("url").substr(-1, 1).isin(*"01234"))
    n_first = first.count()
    first.write.parquet(src)

    q = start_extract_stream(spark, src, out, ckpt, trigger_once=True)
    assert q.awaitTermination(120), "stream did not finish in time"
    got = spark.read.parquet(out)
    assert got.count() == n_first
    assert got.where(F.col("parse_error").isNotNull()).count() == 0

    # drop the remaining pages into the feed; restart resumes from the
    # checkpoint offset log and processes ONLY the new file
    pages.where(~F.col("url").substr(-1, 1).isin(*"01234")).write.mode(
        "append"
    ).parquet(src)
    q2 = start_extract_stream(spark, src, out, ckpt, trigger_once=True)
    assert q2.awaitTermination(120), "resumed stream did not finish in time"

    result = spark.read.parquet(out)
    assert result.count() == n
    assert result.select("url").distinct().count() == n


def test_stateful_dedup_first_seen(spark, tmp_path):
    """applyInPandasWithState dedup: only first-ever occurrence of each
    content hash is emitted, including ACROSS restarts (state restored
    from the checkpoint)."""
    from pyspark.sql import functions as F

    from hickoryspark.spark.streaming import dedup_first_seen_stream

    src = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_batch(rows):
        spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, "
                  "text string, lang string"
        ).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(
                "url string, warc_ts timestamp, html binary, "
                "text string, lang string"
            ).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            dedup_first_seen_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "dedup stream did not finish in time"

    import datetime

    t = datetime.datetime(2025, 7, 25)
    # batch 1: A, A-dup, B
    run_batch([
        ("u1", t, b"<p>A</p>", "", "en"),
        ("u2", t, b"<p>A</p>", "", "en"),
        ("u3", t, b"<p>B</p>", "", "en"),
    ])
    got1 = spark.read.parquet(out)
    assert got1.count() == 2
    assert got1.select("content_hash").distinct().count() == 2

    # batch 2 (restart): A again (dropped via restored state), C (new)
    run_batch([
        ("u4", t, b"<p>A</p>", "", "en"),
        ("u5", t, b"<p>C</p>", "", "en"),
    ])
    got2 = spark.read.parquet(out)
    assert got2.count() == 3
    hashes = {r["content_hash"] for r in got2.collect()}
    assert len(hashes) == 3
    urls = {r["url"] for r in got2.collect()}
    assert "u4" not in urls  # duplicate content dropped across restart


def test_stateful_dedup_state_ttl_expires_and_reemits(spark, tmp_path):
    """round-3 verdict #5: with state_ttl_seconds, a hash's state entry
    expires after the TTL (bounding the store on an endless crawl) and
    a hash re-arriving AFTER expiry is re-emitted as first-seen. TTL
    mode runs on a continuous processingTime trigger (the engine keeps
    triggering batches to deliver pending timeouts — availableNow
    would never terminate)."""
    import datetime
    import time

    from hickoryspark.spark.streaming import dedup_first_seen_stream

    src = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    schema = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    t = datetime.datetime(2025, 7, 25)

    def feed(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    def urls_out(expect, timeout=60):
        deadline = time.time() + timeout
        got = set()
        while time.time() < deadline:
            try:
                got = {r["url"] for r in spark.read.parquet(out).collect()}
            except Exception:
                got = set()
            if got >= expect:
                return got
            time.sleep(0.5)
        return got

    feed([("u1", t, b"<p>A</p>", "", "en")])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_first_seen_stream(stream, state_ttl_seconds=15.0)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        assert urls_out({"u1"}) == {"u1"}

        # within the TTL: duplicate content dropped (and its arrival
        # re-arms A's timer)
        feed([("u2", t, b"<p>A</p>", "", "en"),
              ("u2b", t, b"<p>C</p>", "", "en")])
        assert urls_out({"u2b"}) == {"u1", "u2b"}  # u2 dropped

        # sleep past the TTL; the continuously-triggering engine fires
        # the timeout and removes A's expired state, then a re-arrival
        # is first-seen again and re-emitted. (The wide TTL/sleep
        # margins absorb this VM's documented multi-second stalls —
        # a tight TTL flaked when the duplicate arrived after expiry.)
        time.sleep(30.0)
        feed([("u4", t, b"<p>A</p>", "", "en")])
        got = urls_out({"u4"})
        assert got == {"u1", "u2b", "u4"}
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    # u1 and u4 carry the same content hash — the re-emit is real
    hashes = {}
    for r in rows:
        hashes.setdefault(r["content_hash"], set()).add(r["url"])
    assert {"u1", "u4"} in hashes.values()


def test_host_throughput_window(spark):
    from hickoryspark.spark.pages import load_pages
    from hickoryspark.spark.streaming import host_throughput_stream

    # windowed agg is testable on a batch frame (same plan semantics
    # minus the incremental trigger)
    pages = load_pages(spark, SF_DIR)
    agg = host_throughput_stream(pages)
    rows = agg.collect()
    assert sum(r["pages"] for r in rows) == pages.count()
    assert all(r["host"] == "ex.test" for r in rows)


def test_stateful_sessionize_closed_sessions(spark, tmp_path):
    """Single-batch: emitted sessions = batch sessionization minus
    each user's final (still-open) session; cross-batch: the open
    session is restored from the checkpoint and closed by a later
    batch's distant event."""
    import datetime as dt

    from hickoryspark.spark.streaming import sessionize_stream

    def _t(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    schema = "event_id long, ts timestamp_ntz, user_id long"
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            sessionize_stream(stream, gap_minutes=30)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(120)
        return sorted(tuple(r) for r in spark.read.parquet(out).collect())

    got = run([
        # user 1: two closed sessions + one open
        (1, _t(0), 1), (2, _t(10), 1),          # s1: 0-10
        (3, _t(60), 1),                          # s2: 60
        (4, _t(120), 1), (5, _t(125), 1),        # open
        # user 2: one open session only -> nothing emitted
        (6, _t(0), 2), (7, _t(20), 2),
    ])
    assert got == [
        (1, "2024-01-01 00:00:00.000000", "2024-01-01 00:10:00.000000", 2),
        (1, "2024-01-01 01:00:00.000000", "2024-01-01 01:00:00.000000", 1),
    ]

    # a later batch: user 1's distant event closes the open session
    # (state restored from the checkpoint); user 2 stays open
    got2 = run([(8, _t(500), 1)])
    assert (1, "2024-01-01 02:00:00.000000",
            "2024-01-01 02:05:00.000000", 2) in got2
    assert not [r for r in got2 if r[0] == 2]
