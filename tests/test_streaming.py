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
