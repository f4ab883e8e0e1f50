"""Deterministic corpus sharding + shard manifests — the write-side
contract of a training-data pipeline: reproducible shard assignment
(re-running the pipeline on the same corpus must yield the same
shard for every document, on any cluster, at any parallelism) and a
verifiable per-shard manifest (doc count, byte count, content
checksum) so a consumer can audit a delivered shard set without
re-reading the corpus.

Pinned dialect (oracle-reproducible):

- ``shard(key) = ('0x' || substr(md5('sh:' || key), 1, 12)) % n``
  — the repo's salted-md5 position rule (ops/sketch._md5_pos), NOT
  Spark's hash() (engine-private, version-dependent);
- per-item digest = the first 15 md5 hex chars (60 bits — never
  touches the BIGINT sign) of ``key || ':' || marker || payload``
  where marker is '0' for a NULL payload and '1' otherwise (NULL and
  '' stay distinguishable);
- ``checksum`` = BIT_XOR of the item digests — order-independent
  (any task/partition order yields the same value) and MERGEABLE
  (xor of two half-manifests = the manifest of the union, for
  append-style delivery);
- ``total_bytes`` = sum of octet lengths (NULL payload counts 0).

Scale shape: one projection + one groupBy(shard) with map-side
combine — the shuffle carries at most n_shards rows per task.
``write_shards`` routes with a FULL-CARDINALITY repartition column
(shard, key) — repartitioning on the shard value alone hashes ~n
distinct values into n partitions and goes birthday-lumpy (the
CLAUDE.md salt_repartition lesson); partitionBy on write gives one
directory per shard regardless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["shard_of", "shard_manifest", "write_shards",
           "duckdb_shard_manifest_sql"]


def shard_of(key: Column, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards) for a key column."""
    h12 = F.substring(
        F.md5(F.concat(F.lit("sh:"), key.cast("string"))), 1, 12)
    return F.conv(h12, 16, 10).cast("long") % n_shards


def _digest(key: Column, payload: Column) -> Column:
    marker = F.when(payload.isNull(), F.lit("0")).otherwise(F.lit("1"))
    h15 = F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":"), marker,
                       F.coalesce(payload, F.lit("")))), 1, 15)
    return F.conv(h15, 16, 10).cast("long")


def shard_manifest(
    docs: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    payload_col: str = "text",
) -> DataFrame:
    """(shard, n_docs, total_bytes, checksum) — every shard present
    in the corpus (empty shards are absent: a manifest describes
    delivered files)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key, payload = F.col(key_col), F.col(payload_col)
    return (
        docs.select(
            shard_of(key, n_shards).alias("shard"),
            F.coalesce(F.octet_length(payload), F.lit(0))
            .cast("long").alias("_b"),
            _digest(key, payload).alias("_d"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_b").cast("long").alias("total_bytes"),
            F.expr("bit_xor(_d)").cast("long").alias("checksum"),
        )
    )


def write_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
) -> None:
    """Write the corpus as a parquet dataset partitioned by shard
    directory (``shard=K/``). Routing repartitions on (shard, key) —
    full cardinality, exact balance — never on the ~n_shards-distinct
    shard value alone."""
    with_shard = docs.withColumn(
        "shard", shard_of(F.col(key_col), n_shards))
    (with_shard
     .repartition(F.col("shard"), F.col(key_col))
     .write.partitionBy("shard").mode("overwrite").parquet(path))


def duckdb_shard_manifest_sql(
    docs_rel: str,
    n_shards: int,
    key_col: str = "doc_id",
    payload_col: str = "text",
) -> str:
    """Full DuckDB mirror of :func:`shard_manifest`."""
    key = f"CAST({key_col} AS VARCHAR)"
    pay = payload_col
    return f"""
        WITH item AS (
          SELECT CAST(('0x' || substr(md5('sh:' || {key}), 1, 12))
                          ::BIGINT % {n_shards} AS BIGINT) AS shard,
                 CAST(COALESCE(octet_length(encode({pay})), 0)
                          AS BIGINT) AS b,
                 CAST(('0x' || substr(md5({key} || ':' ||
                          CASE WHEN {pay} IS NULL THEN '0'
                               ELSE '1' END ||
                          COALESCE({pay}, '')), 1, 15))::BIGINT
                          AS BIGINT) AS d
          FROM {docs_rel}
        )
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(b) AS BIGINT) AS total_bytes,
               CAST(BIT_XOR(d) AS BIGINT) AS checksum
        FROM item GROUP BY shard"""
