"""The scale job: skew-aware, checkpoint-resumable extraction pipeline.

Implements the north_rule operational requirements (BASELINE.json):
- **Skew handling**: repartition on ``xxhash64(url) % S`` (salt) plus a
  page-size bucket (``floor(log2(len(html)))``) so giant documents
  spread across partitions instead of straggling one; per-page work is
  row-independent, so this is the only shuffle in the job.
- **Checkpoint/resume**: output is the checkpoint. On resume, already-
  processed urls are anti-joined away before any parse work happens
  (broadcast when small; Spark plans a shuffled left-anti otherwise).
- **Lineage + counters**: per-partition metrics (pages, parse errors,
  nodes, extracted bytes) are written to ``<out>_lineage`` keyed by
  (run_id, partition_id); the same totals are surfaced on the driver
  via accumulators for live monitoring.

Sink format: at design scale this is an Iceberg append
(``df.writeTo("db.extracted").append()``); this sandbox has no Iceberg
runtime jar, so we write parquet with the identical schema — the
pipeline code is sink-agnostic (``sink_format`` arg).
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hickoryspark.spark.extract import EXTRACT_SCHEMA, extract_batch

LINEAGE_SCHEMA = (
    "run_id string, partition_id int, pages long, parse_errors long, "
    "nodes long, text_bytes long"
)


#: pages larger than this are "giants" and get striped round-robin
GIANT_CUTOFF_BYTES = 1 << 16  # 64 KiB


def salt_repartition(pages: DataFrame, num_partitions: int) -> DataFrame:
    """Skew-aware repartition (SURVEY.md §4.2 'skew handling').

    Two-level routing: documents above GIANT_CUTOFF_BYTES stripe
    round-robin (exact count balance — hash-routing a handful of
    giants is Poisson-lumpy at EVERY scale: some partition draws 2-3×
    its share of 100 MB documents and straggles the stage), while the
    small-page bulk hash-partitions on the full-cardinality
    xxhash64(url) (uniform by the law of large numbers). The union
    keeps the two classes in separate partitions, so parse tasks are
    size-homogeneous — better straggler behavior than mixing one giant
    into an otherwise-small task. Still one shuffle; 2×num_partitions
    tasks, half of them typically near-empty.
    """
    sz = F.length("html")
    giants = pages.where(sz > GIANT_CUTOFF_BYTES).repartition(num_partitions)
    smalls = pages.where(sz.isNull() | (sz <= GIANT_CUTOFF_BYTES)).repartition(
        num_partitions, F.xxhash64("url")
    )
    return giants.unionAll(smalls)


def run_extract(
    spark: SparkSession,
    pages: DataFrame,
    out_path: str,
    *,
    num_partitions: int | None = None,
    resume: bool = True,
    run_id: str | None = None,
    sink_format: str = "parquet",
) -> dict:
    """Run the extraction job; returns driver-side metrics totals.

    Idempotent under restart: output parquet doubles as the checkpoint;
    a killed run re-processes only the urls missing from the output.
    """
    sc = spark.sparkContext
    num_partitions = num_partitions or sc.defaultParallelism
    run_id = run_id or f"run-{int(time.time())}"
    lineage_path = out_path.rstrip("/") + "_lineage"

    if resume and _exists(spark, out_path, sink_format):
        done = spark.read.format(sink_format).load(out_path).select("url")
        pages = pages.join(done, "url", "left_anti")

    pages = salt_repartition(pages.select("url", "html"), num_partitions)

    acc_pages = sc.accumulator(0)
    acc_errors = sc.accumulator(0)
    acc_nodes = sc.accumulator(0)
    acc_text = sc.accumulator(0)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        pages_n = errors_n = nodes_n = text_b = 0
        for b in batches:
            if not len(b):
                continue
            out = extract_batch(b)
            pages_n += len(out)
            errors_n += int(out["parse_error"].notna().sum())
            nodes_n += int(out["n_nodes"].sum())
            text_b += int(out["main_text_len"].sum())
            out["run_id"] = run_id
            out["partition_id"] = pid
            yield out
        acc_pages.add(pages_n)
        acc_errors.add(errors_n)
        acc_nodes.add(nodes_n)
        acc_text.add(text_b)

    result_schema = EXTRACT_SCHEMA + ", run_id string, partition_id int"
    extracted = pages.mapInPandas(gen, result_schema)
    extracted.write.format(sink_format).mode("append").save(out_path)

    # lineage from the just-written output (one tiny aggregation scan;
    # avoids a second pass over the raw pages). The aggregation covers
    # ALL output rows with this run_id, so a resumed run reusing a
    # run_id must REPLACE its lineage partition, not append — an append
    # would leave two aggregations whose sums double-count the first
    # attempt's rows. partitionBy(run_id) + dynamic partition overwrite
    # rewrites only this run's partition, leaving other runs untouched.
    lineage = (
        spark.read.format(sink_format)
        .load(out_path)
        .where(F.col("run_id") == run_id)
        .groupBy("run_id", "partition_id")
        .agg(
            F.count("*").alias("pages"),
            F.count("parse_error").alias("parse_errors"),
            F.sum("n_nodes").alias("nodes"),
            F.sum("main_text_len").alias("text_bytes"),
        )
    )
    (
        lineage.write.format(sink_format)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("run_id")
        .save(lineage_path)
    )

    # Exact totals come from the COMMITTED lineage (accumulators update
    # inside a transformation, so task retries / speculative attempts
    # can double-count them — they remain useful only as live-progress
    # signals on the driver).
    import pyspark.sql.functions as _F

    totals = (
        spark.read.format(sink_format)
        .load(lineage_path)
        .where(_F.col("run_id") == run_id)
        .agg(
            _F.coalesce(_F.sum("pages"), _F.lit(0)).alias("pages"),
            _F.coalesce(_F.sum("parse_errors"), _F.lit(0)).alias("parse_errors"),
            _F.coalesce(_F.sum("nodes"), _F.lit(0)).alias("nodes"),
            _F.coalesce(_F.sum("text_bytes"), _F.lit(0)).alias("text_bytes"),
        )
        .collect()[0]
    )
    return {
        "run_id": run_id,
        "pages": int(totals["pages"]),
        "parse_errors": int(totals["parse_errors"]),
        "nodes": int(totals["nodes"]),
        "text_bytes": int(totals["text_bytes"]),
    }


def _exists(spark: SparkSession, path: str, fmt: str) -> bool:
    if not os.path.exists(path):
        return False
    try:
        spark.read.format(fmt).load(path).limit(1).collect()
        return True
    except Exception:
        return False
