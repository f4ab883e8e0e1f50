"""Generic column profiling — dataset health checks at ingest time.

Every corpus-building pipeline starts (and every debugging session
restarts) with the same questions per column: how many rows, how many
NULLs, how many distinct values, how many empty strings. This op
answers them for ANY DataFrame in one pass, emitting one row per
profiled column — the Spark-side analogue of a warehouse DESCRIBE
EXTENDED, but exact and oracle-checkable.

Pinned semantics:

- ``n_distinct`` is EXACT and counts NULL as a value when present
  (count_distinct over the column plus one if any NULL exists — the
  "distinct including null" convention, pinned so both engines
  agree); approximate profiling at the 100-TB tier should reach for
  ops/sketch.py HyperLogLog instead;
- ``n_empty`` counts zero-length values after CAST to string — for
  non-string columns that is the empty-cast count (always 0 for
  numeric types), pinned;
- column order in the output follows the requested column list
  (``col_pos``).

Scale shape: ONE aggregation pass over the input computes every
per-column count (no per-column scans); the exact distincts are one
expression each inside the same agg — Spark rewrites multiple
count_distinct into a single expand + aggregate. For very wide
tables profile a column subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "duckdb_profile_sql"]


def profile_columns(df: DataFrame, cols: list[str] | None = None
                    ) -> DataFrame:
    """→ one row per column: ``(col_pos, column, n_rows, n_null,
    n_distinct, n_empty)``."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).cast("long")
            .alias(f"_null_{c}"),
            (F.count_distinct(col)
             + F.max(col.isNull().cast("long")))
            .cast("long").alias(f"_dist_{c}"),
            F.sum((col.cast("string") == "").cast("long")).cast("long")
            .alias(f"_empty_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = None
    for pos, c in enumerate(cols):
        one = wide.select(
            F.lit(pos).cast("int").alias("col_pos"),
            F.lit(c).alias("column"),
            "n_rows",
            F.coalesce(F.col(f"_null_{c}"), F.lit(0)).cast("long")
            .alias("n_null"),
            F.coalesce(F.col(f"_dist_{c}"), F.lit(0)).cast("long")
            .alias("n_distinct"),
            F.coalesce(F.col(f"_empty_{c}"), F.lit(0)).cast("long")
            .alias("n_empty"),
        )
        rows = one if rows is None else rows.unionAll(one)
    return rows


def duckdb_profile_sql(input_rel: str, cols: list[str]) -> str:
    """DuckDB mirror of :func:`profile_columns` over ``input_rel``."""
    if not cols:
        raise ValueError("duckdb_profile_sql needs at least one column")
    parts = []
    for pos, c in enumerate(cols):
        parts.append(f"""
        SELECT CAST({pos} AS INTEGER) AS col_pos, '{c}' AS column,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(CASE WHEN {c} IS NULL THEN 1
                                 ELSE 0 END), 0) AS BIGINT) AS n_null,
               CAST(COALESCE(COUNT(DISTINCT {c})
                    + MAX(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END),
                    0) AS BIGINT) AS n_distinct,
               CAST(COALESCE(SUM(CASE WHEN CAST({c} AS VARCHAR) = ''
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_empty
        FROM {input_rel}""")
        parts.append(" UNION ALL ")
    return "".join(parts[:-1])
