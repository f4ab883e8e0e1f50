"""Bucketed (pre-partitioned, co-located) tables for shuffle-free joins.

At design scale the url-keyed joins (extract output x lineage x crawl
metadata, dedup assignments x pages) repeat every pipeline run; paying
a full shuffle of the 100 TB fact side each time is the single biggest
avoidable cost. Bucketing materializes the table hash-partitioned AND
sorted by the join key once at write time; any later equi-join between
two tables bucketed on the same key with the same bucket count needs
NO exchange — Catalyst plans a zipped sort-merge join over matching
buckets (verified by tests/test_plan_shapes.py: no Exchange on either
bucketed side).

Bucket-count guidance at scale: pick so one bucket of the FACT table
is 100-500 MB compressed (e.g. 100 TB / 256 MB ≈ 400k buckets is too
many files per write — in practice partition by crawl/date first, then
~4k buckets inside each partition). Both join sides must use the SAME
count — a mismatch silently reintroduces the shuffle.

Spark's bucketed writes go through the session catalog (saveAsTable);
path-only parquet cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    num_buckets: int,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed catalog table on ``keys``.

    ``sort=True`` additionally sorts each bucket by the keys, letting
    the join skip its sort as well (zipped merge of pre-sorted runs).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    writer = df.write.mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.format("parquet").saveAsTable(table)


def _bucket_spec(spark: SparkSession, table: str) -> tuple[int, tuple]:
    """(num_buckets, bucket_columns) from the catalog, (0, ()) when
    the table is not bucketed."""
    n, cols = 0, ()
    for row in spark.sql(f"DESCRIBE EXTENDED {table}").collect():
        if row["col_name"] == "Num Buckets":
            n = int(row["data_type"])
        elif row["col_name"] == "Bucket Columns":
            cols = tuple(
                c.strip(" `") for c in row["data_type"].strip("[]").split(",")
            )
    return n, cols


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str] | str
) -> DataFrame:
    """Equi-join two same-bucketed catalog tables; with matching
    bucket specs the plan contains no Exchange on either side.

    Raises ValueError when the specs do NOT match — a mismatch (or a
    forgotten bucketBy) silently reintroduces the full fact-table
    shuffle this module exists to avoid, so it must be an error, not
    a quiet plan change."""
    on = [on] if isinstance(on, str) else list(on)
    ls, rs = _bucket_spec(spark, left), _bucket_spec(spark, right)
    if ls != rs or ls[0] == 0 or tuple(on) != ls[1]:
        raise ValueError(
            f"bucketed_join: specs must match the join key — "
            f"{left}={ls}, {right}={rs}, on={on}"
        )
    return spark.table(left).join(spark.table(right), on)
