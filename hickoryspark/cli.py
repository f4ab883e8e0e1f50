"""spark-submit entry point for the extraction pipeline.

North-rule operational contract (BASELINE.json): the job is "launched
via spark-submit --py-files at N and 4N executors". Packaging + launch:

    cd /root/repo && zip -r /tmp/hickoryspark.zip hickoryspark
    spark-submit --master <cluster> --py-files /tmp/hickoryspark.zip \
        tools/submit_extract.py \
        --input /data/pages_parquet --output /data/extracted \
        [--input-format iceberg --input-table db.pages] \
        [--partitions 4096] [--no-resume] [--run-id r42]

(tools/submit_extract.py is a thin launcher kept outside the package:
spark-submit puts the entry script's directory on sys.path, which
would shadow package-internal module resolution if the entry script
lived inside hickoryspark/.)

In this sandbox there is no cluster manager and no Iceberg runtime jar,
so the same entry runs with --master local[N] and parquet IO; the code
path (salted+size-bucketed repartition -> mapInPandas extraction ->
sink append + lineage) is identical.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hickoryspark-extract")
    ap.add_argument("--input", help="path of the pages table (parquet dir)")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--input-table",
                    help="iceberg table name (with --input-format iceberg)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--sink-format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--partitions", type=int, default=None,
                    help="shuffle width for the salted repartition "
                         "(default: sc.defaultParallelism)")
    ap.add_argument("--no-resume", action="store_true",
                    help="reprocess everything even if output exists")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from hickoryspark.spark.pipeline import run_extract

    # spark-submit owns master/executor config; builder only names the app
    spark = SparkSession.builder.appName("hickoryspark-extract").getOrCreate()

    if args.input_format == "iceberg":
        if not args.input_table:
            ap.error("--input-table is required with --input-format iceberg")
        pages = spark.read.format("iceberg").load(args.input_table)
    else:
        if not args.input:
            ap.error("--input is required with --input-format parquet")
        pages = spark.read.parquet(args.input)

    metrics = run_extract(
        spark,
        pages,
        args.output,
        num_partitions=args.partitions,
        resume=not args.no_resume,
        run_id=args.run_id,
        sink_format=args.sink_format,
    )
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
