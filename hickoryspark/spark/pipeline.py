"""The scale job: skew-aware, checkpoint-resumable extraction pipeline.

Implements the north_rule operational requirements (BASELINE.json):
- **Skew handling**: two-level routing in ONE scan + ONE shuffle —
  giant pages stripe round-robin to exact partition targets (via
  murmur-preimage route values), the small-page bulk rides a
  full-cardinality ``xxhash64(url)``; per-page work is
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

#: (num_partitions, applicationId) -> murmur-preimage route values
_PREIMAGE_CACHE: dict[tuple[int, str], list[int]] = {}


def _hash_preimages(spark, n: int) -> list[int]:
    """n integers r_0..r_{n-1} with ``pmod(hash(r_i), n) == i`` under
    Spark's Murmur3 hash partitioning.

    ``repartition(n, col)`` routes a row to ``murmur3(value) % n`` —
    NOT to ``value % n`` — so "route = k" does not land in partition k
    and n distinct route values land birthday-lumpy (some partitions
    get 2-3 values, some none). Evaluating Spark's own ``hash()`` over
    a small integer range and picking one preimage per bucket gives
    route values with EXACT partition targets. One tiny driver-local
    job, cached per (n, session); 4·n·ln(n) candidates make a missing
    bucket vanishingly unlikely (asserted, not assumed).
    """
    key = (n, spark.sparkContext.applicationId)
    pre = _PREIMAGE_CACHE.get(key)
    if pre is None:
        import math

        n_cand = max(64, int(4 * n * max(1.0, math.log(n + 1))))
        rows = (
            spark.range(n_cand)
            .select(
                F.col("id").cast("long").alias("r"),
                F.pmod(F.hash(F.col("id").cast("long")), F.lit(n)).alias("b"),
            )
            .collect()
        )
        by_bucket: dict[int, int] = {}
        for row in rows:
            by_bucket.setdefault(row["b"], row["r"])
        assert len(by_bucket) == n, f"preimage search incomplete: {len(by_bucket)}/{n}"
        pre = [by_bucket[i] for i in range(n)]
        _PREIMAGE_CACHE[key] = pre
    return pre


def salt_repartition(pages: DataFrame, num_partitions: int) -> DataFrame:
    """Skew-aware repartition (SURVEY.md §4.2 'skew handling') — one
    scan, one shuffle.

    Two-level routing: documents above GIANT_CUTOFF_BYTES stripe
    round-robin to EXACT partition targets (hash-routing a handful of
    giants is Poisson-lumpy at EVERY scale — some partition draws 2-3×
    its share of 100 MB documents and straggles the stage), while the
    small-page bulk routes on a full-cardinality url hash (uniform by
    the law of large numbers).

    Mechanics: an Arrow-batched route-assignment pass keeps a per-task
    GIANT counter (a column-expression row counter like
    monotonically_increasing_id would be periodic — giants spaced at a
    multiple of n all collapse onto one route), and the giant routes
    are murmur PREIMAGES of 0..n-1 (``repartition(n, col)`` sends a
    row to ``murmur3(value) % n``, so raw 0..n-1 routes would land
    birthday-lumpy). One pass — a where/union two-leg plan would read
    the 100 TB input twice; the extra Arrow hop rides the same
    exchange the parse UDF uses anyway.
    """
    import zlib

    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    spark = pages.sparkSession
    pre = _hash_preimages(spark, num_partitions)
    n = num_partitions
    cutoff = GIANT_CUTOFF_BYTES
    # fresh StructType: df.schema is CACHED on the DataFrame and
    # StructType.add mutates in place — appending to it would corrupt
    # pages.columns and break the mapInPandas input binding
    out_schema = StructType(
        list(pages.schema.fields) + [StructField("route", LongType())]
    )
    cols = pages.columns

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        # stripe start offset = task id: every task striping from 0
        # would pile each task's FIRST giant onto the same partition
        ctx = TaskContext.get()
        gi = ctx.partitionId() if ctx is not None else 0
        for b in batches:
            if not len(b):
                continue
            routes = np.empty(len(b), dtype=np.int64)
            for i, (url, html) in enumerate(zip(b["url"], b["html"])):
                # cutoff is in BYTES: str payloads measure characters.
                # Encode only in the ambiguous zone (chars <= cutoff <
                # 4*chars, the UTF-8 worst case) — hot loop, and most
                # pages are decisively on one side.
                size = 0 if html is None else len(html)
                if (
                    isinstance(html, str)
                    and size <= cutoff < size * 4
                ):
                    size = len(html.encode())
                if size > cutoff:
                    routes[i] = pre[gi % n]
                    gi += 1
                else:
                    # crc32: fast, deterministic, high-cardinality —
                    # murmur spreads it uniformly at the shuffle
                    routes[i] = zlib.crc32(str(url).encode())
            out = b.copy()
            out["route"] = routes
            yield out

    routed = pages.mapInPandas(assign, out_schema)
    return routed.repartition(num_partitions, "route").select(*cols)


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
    # NOTE layout versioning: lineage is run_id-PARTITIONED (dynamic
    # overwrite replaces exactly this run's partition). A lineage table
    # written by the pre-partitioned layout (flat files with run_id as
    # a data column) cannot be mixed with this one — Spark rejects
    # conflicting directory structures — so migrating an old
    # deployment needs a one-time read+rewrite of <out>_lineage.
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
