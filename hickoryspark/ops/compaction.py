"""Small-file compaction planning — the table-maintenance step every
100 TB lakehouse runs nightly: group undersized data files into
target-size rewrite jobs (Iceberg's ``rewrite_data_files`` /, Delta's
``OPTIMIZE`` bin-packing), leaving already-large files alone.

Pinned plan semantics (deterministic, oracle-reproducible):

- scope: files are planned WITHIN a partition column (compaction
  never merges across table partitions); ``part_col`` names it.
- files with ``bytes >= target_bytes`` are emitted as their own
  singleton group (``full`` = true) and excluded from packing — they
  are already healthy, and rewriting them is wasted IO.
- the small files of a partition are ordered by (bytes DESC,
  file_id) and packed NEXT-FIT against the running total:
  ``group_id = cum_bytes_before div target_bytes``. Largest-first
  ordering keeps groups near-balanced; next-fit (vs best-fit) keeps
  the rule a pure prefix-sum — one window, no iteration, same answer
  on both engines.
- group ids are per-partition; full files take ids AFTER the packed
  range (``n_packed_groups + rank``) so ids never collide.

All arithmetic is non-negative BIGINT (``div`` == ``//``).

Scale shape: this plans over file METADATA (one row per data file —
~1M rows for 100 TB at 128 MB files), so per-partition windows are
cheap and skew-safe: no partition dir realistically holds enough
file entries to straggle a window task. The data itself is never
touched — the plan is what a rewrite job consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["compaction_plan", "duckdb_compaction_sql"]


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "part",
    file_col: str = "file_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """File metadata -> rewrite plan: ``(part, file_id, bytes,
    group_id, full)``; ``full`` marks healthy singleton groups."""
    b = F.col(bytes_col).cast("long")
    base = files.select(
        F.col(part_col).alias("part"),
        F.col(file_col).alias("file_id"),
        b.alias("bytes"),
        (b >= target_bytes).alias("full"),
    )
    small = base.where(~F.col("full")).withColumn(
        "group_id",
        F.expr(
            f"coalesce(sum(bytes) over (partition by part "
            f"order by bytes desc, file_id "
            f"rows between unbounded preceding and 1 preceding), 0) "
            f"div {int(target_bytes)}"
        ).cast("long"),
    )
    # null-safe: a NULL partition value is still a partition (the
    # category_mix lesson — a plain equi-join would silently orphan
    # its full files at group_id base 0 while its packed groups exist)
    n_groups = small.groupBy("part").agg(
        (F.max("group_id") + 1).alias("_ng")
    ).withColumnRenamed("part", "_ng_part")
    w_full = Window.partitionBy("part").orderBy(F.col("bytes").desc(),
                                                "file_id")
    full = (
        base.where(F.col("full"))
        .withColumn("_rk", F.row_number().over(w_full).cast("long"))
        .join(
            F.broadcast(n_groups),
            F.col("part").eqNullSafe(F.col("_ng_part")),
            "left",
        )
        .drop("_ng_part")
        .withColumn(
            "group_id",
            (F.coalesce(F.col("_ng"), F.lit(0)) + F.col("_rk") - 1)
            .cast("long"),
        )
        .drop("_rk", "_ng")
    )
    return small.unionByName(full).select(
        "part", "file_id", "bytes", "group_id", "full"
    )


def duckdb_compaction_sql(files_rel: str, target_bytes: int) -> str:
    """Full mirror over a relation with (part, file_id, bytes)."""
    t = int(target_bytes)
    return f"""
        WITH base AS (
          SELECT part, file_id, CAST(bytes AS BIGINT) AS bytes,
                 bytes >= {t} AS "full"
          FROM {files_rel}),
        small AS (
          SELECT part, file_id, bytes,
                 CAST(COALESCE(SUM(bytes) OVER (
                        PARTITION BY part
                        ORDER BY bytes DESC, file_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) // {t} AS BIGINT)
                   AS group_id,
                 false AS "full"
          FROM base WHERE NOT "full"),
        ng AS (SELECT part, MAX(group_id) + 1 AS _ng
               FROM small GROUP BY part),
        fullf AS (
          SELECT b.part, b.file_id, b.bytes,
                 CAST(COALESCE(ng._ng, 0)
                      + ROW_NUMBER() OVER (
                          PARTITION BY b.part
                          ORDER BY b.bytes DESC, b.file_id) - 1
                      AS BIGINT) AS group_id,
                 true AS "full"
          FROM base b LEFT JOIN ng
            ON b.part IS NOT DISTINCT FROM ng.part
          WHERE b."full")
        SELECT part, file_id, bytes, group_id, "full" FROM small
        UNION ALL
        SELECT part, file_id, bytes, group_id, "full" FROM fullf"""
