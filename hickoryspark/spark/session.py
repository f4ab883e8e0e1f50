"""SparkSession builder tuned for the HTML-extraction workload.

Design notes for the 100 TB target (SURVEY.md §4.3): all per-page work
is row-independent, so throughput is gated by (a) Arrow batch exchange
overhead — amortized with moderate batch sizes, (b) Python worker
startup — amortized with ``spark.python.worker.reuse``, (c) partition
balance — handled by the pipeline's two-level skew routing, not here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "hickoryspark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    ``parallelism`` pins ``local[n]`` — the bench harness uses this to
    evidence the N→4N scaling gate (local[8] vs local[32]).
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        # runtime skew splitting for the url-keyed joins (crawl hot
        # spots): tested end-to-end in tests/test_plan_shapes.py
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~128 pages per Arrow batch: large enough to amortize IPC,
        # small enough that a batch of worst-case pages fits in memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        .config("spark.python.worker.reuse", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
