"""As-of join (backward-inclusive temporal join).

The time-series primitive Spark lacks as a builtin: for every left
row, attach the most recent right row with the same key whose
timestamp is <= the left timestamp (kdb's ``aj``, pandas
``merge_asof``, DuckDB ``ASOF JOIN``). Event analytics uses it
constantly — attribute a purchase to the last preceding view, a
crawl fetch to the robots snapshot in force at fetch time.

Pinned semantics (the gate oracle is DuckDB's NATIVE ASOF LEFT JOIN
— an independent engine formulation, not a mirror):

- backward INCLUSIVE: a right row at exactly the left timestamp
  matches;
- the right side is first deduplicated to ONE row per (keys, ts):
  the row with the greatest ``payload_cols`` tuple wins (DuckDB's
  ASOF leaves duplicate-ts choice unspecified — the dedup pins it);
- unmatched left rows survive with NULL matched columns (left join);
- ``tolerance_seconds``: matches older than the tolerance are
  demoted to no-match (both engines compute the age as an epoch
  difference — timezone-offset-free because both sides shift
  identically).

Scale shape — the union-window formulation, NOT a per-row range
join: right rows (tag 0) and left rows (tag 1) union on (keys, ts,
tag) order, one window partition per key takes
``last(payload, ignorenulls)`` over the preceding frame, and left
rows read their match off the running state. ONE shuffle on the
keys, no broadcast of either side, no quadratic key-group blowup —
equal-key events land in one sorted pass (kdb's algorithm,
relationally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "TS_FMT", "DUCKDB_TS_FMT"]

#: fixed 6-digit fractional-second render — Spark's plain string cast
#: and DuckDB's VARCHAR cast both TRIM trailing zeros (and disagree
#: about it); an explicit format is hash-stable on both engines
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
DUCKDB_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: tuple = ("user_id",),
    ts_col: str = "ts",
    payload_cols: tuple = ("event_id",),
    prefix: str = "matched_",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """All ``left`` columns plus ``<prefix>ts`` and ``<prefix><col>``
    for each payload column (NULL when no right row precedes)."""
    keys = list(keys)
    r0 = (
        right.groupBy(*keys, ts_col)
        .agg(F.max(F.struct(*[F.col(c) for c in payload_cols]))
             .alias("_p"))
        .select(
            *keys,
            F.col(ts_col),
            F.lit(0).alias("_tag"),
            F.struct(
                F.col(ts_col).alias("_mts"),
                *[F.col("_p")[c].alias(c) for c in payload_cols],
            ).alias("_pay"),
        )
    )
    lf = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r0.schema["_pay"].dataType).alias("_pay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
    )
    r = r0.withColumn(
        "_left", F.lit(None).cast(lf.schema["_left"].dataType))
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(lf)
        .withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .where(F.col("_tag") == 1)
    )
    if tolerance_seconds is not None:
        # NTZ won't cast to long directly; via TIMESTAMP both sides
        # shift by the same session offset, so the DIFFERENCE is
        # timezone-free (the events hash-stability discipline).
        # unix_micros, not a seconds cast: a second-truncated age
        # would keep sub-second-stale matches past the tolerance
        age = (F.unix_micros(F.col(ts_col).cast("timestamp"))
               - F.unix_micros(F.col("_m._mts").cast("timestamp")))
        matched = matched.withColumn(
            "_m",
            F.when(age <= int(tolerance_seconds) * 1_000_000,
                   F.col("_m")),
        )
    return matched.select(
        *[F.col("_left")[c].alias(c) for c in left.columns],
        F.col("_m._mts").alias(f"{prefix}ts"),
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in payload_cols],
    )
