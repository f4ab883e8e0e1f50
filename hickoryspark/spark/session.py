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
        # Arrow batches: the record cap was 128 when record count was
        # the only memory bound (a batch of worst-case multi-MB pages
        # had to fit). Spark 4's maxBytesPerBatch is the direct knob
        # (guide §4.2): bound batches by BYTES and let narrow-row
        # streams batch wide. NB (r6 review): the record cap governs
        # the JVM->Python INPUT slicing only — mapInPandas output
        # frames are one Arrow batch per yielded DataFrame (verified
        # in pyspark 4.1.2 worker.py/serializers.py), which is why
        # emitters must batch their own yields (ops/dedup.py
        # _emit_triu_pairs). Measured effect of 128 -> 1024 here:
        # a consistent ~10% on the node-table path (interleaved
        # min-of-3 A/B: 2.10s -> 1.87s), neutral elsewhere. Both
        # knobs are per-batch bounds, not scale-tuned constants —
        # they hold unchanged on a cluster.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "16m")
        .config("spark.python.worker.reuse", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
