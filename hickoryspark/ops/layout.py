"""Z-order (Morton) data-layout clustering — the multi-dimensional
file-clustering primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY``:
interleave the bits of two dimension columns so rows close in BOTH
dimensions land in the same output file, then per-file min/max stats
make range predicates on EITHER dimension prune most files (plain
sort-by-one-column layouts only ever prune on the leading column).

Pinned semantics (oracle-reproducible, exact BIGINT throughout):

- bucketize: ``bucket = (clamp(v, lo, hi) - lo) * 2^bits div
  (hi - lo + 1)`` — linear scaling to ``[0, 2^bits)`` against
  caller-supplied bounds (data-derived bounds would need an extra
  pass; the caller knows its domain). ``bits`` is pinned to 16.
- interleave: the classic magic-number bit spread (each 16-bit bucket
  spread to the even bits of 32, dim B shifted up one) — a fixed
  chain of shift/and/or, identical in Spark and DuckDB integer ops.
- file assignment: ``file_id = z div ceil(2^(2*bits) / n_files)`` —
  equal z-RANGE slices (equal-row slices would need a global sort;
  range slices are what layout writers actually produce and are a
  pure function of the row).

Caller contract: ``hi - lo + 1`` must stay below 2^47 so the scaling
multiply cannot overflow BIGINT (seconds-since-epoch, ids, and hash
buckets all qualify).

Scale shape: the z-value and file id are shuffle-free column
expressions; the stats frame is ONE ``groupBy(file_id)`` over at most
``n_files`` groups (map-side partial agg does almost all the work).
``prunable_files`` is driver-side arithmetic over that tiny stats
frame — the same computation a scan planner does with footer stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ZBITS",
    "morton_interleave",
    "zorder_layout",
    "zorder_file_stats",
    "duckdb_zorder_sql",
]

ZBITS = 16
# (shift, mask) chain spreading a 16-bit value onto the even bits of a
# 32-bit lane; shared verbatim with the DuckDB mirror below.
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread(x: Column) -> Column:
    x = x.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_interleave(a: Column, b: Column) -> Column:
    """Interleave two 16-bit buckets: a on even bits, b on odd."""
    return _spread(a).bitwiseOR(F.shiftleft(_spread(b), 1))


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    a_bounds: tuple[int, int],
    b_bounds: tuple[int, int],
    n_files: int,
) -> DataFrame:
    """``df`` plus ``zvalue`` and ``file_id`` layout columns."""
    a_lo, a_hi = a_bounds
    b_lo, b_hi = b_bounds
    ba = F.expr(
        f"((least(greatest(cast({col_a} as bigint), {a_lo}), {a_hi})"
        f" - {a_lo}) * {1 << ZBITS}) div {a_hi - a_lo + 1}"
    ).cast("long")
    bb = F.expr(
        f"((least(greatest(cast({col_b} as bigint), {b_lo}), {b_hi})"
        f" - {b_lo}) * {1 << ZBITS}) div {b_hi - b_lo + 1}"
    ).cast("long")
    z = morton_interleave(ba, bb).cast("long")
    slice_width = -((1 << (2 * ZBITS)) // -n_files)  # ceil div
    return df.withColumn("zvalue", z).withColumn(
        "file_id", F.expr(f"zvalue div {slice_width}").cast("long")
    )


def zorder_file_stats(
    laid_out: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Per-file footer stats: (file_id, n_rows, min/max of each dim) —
    what a scan planner prunes against."""
    a = F.col(col_a).cast("long")
    b = F.col(col_b).cast("long")
    return laid_out.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(a).alias("min_a"),
        F.max(a).alias("max_a"),
        F.min(b).alias("min_b"),
        F.max(b).alias("max_b"),
    )


def prunable_files(stats_rows, lo: int, hi: int, dim: str = "a"):
    """Driver-side planner arithmetic over collected footer stats:
    file_ids whose [min, max] on ``dim`` overlaps [lo, hi]."""
    keep = []
    for r in stats_rows:
        mn, mx = r[f"min_{dim}"], r[f"max_{dim}"]
        if mx >= lo and mn <= hi:
            keep.append(r["file_id"])
    return keep


def duckdb_zorder_sql(
    rel: str,
    col_a: str,
    col_b: str,
    a_bounds: tuple[int, int],
    b_bounds: tuple[int, int],
    n_files: int,
) -> str:
    """The full mirror: bucketize + spread + interleave + slice +
    stats, generated from the SAME constants/steps as the Spark op."""
    a_lo, a_hi = a_bounds
    b_lo, b_hi = b_bounds

    def spread_sql(x: str) -> str:
        e = f"({x} & {0xFFFF})"
        for shift, mask in _SPREAD_STEPS:
            e = f"(({e} | ({e} << {shift})) & {mask})"
        return e

    ba = (
        f"((LEAST(GREATEST(CAST({col_a} AS BIGINT), {a_lo}), {a_hi})"
        f" - {a_lo}) * {1 << ZBITS}) // {a_hi - a_lo + 1}"
    )
    bb = (
        f"((LEAST(GREATEST(CAST({col_b} AS BIGINT), {b_lo}), {b_hi})"
        f" - {b_lo}) * {1 << ZBITS}) // {b_hi - b_lo + 1}"
    )
    slice_width = -((1 << (2 * ZBITS)) // -n_files)
    return f"""
        WITH zb AS (SELECT *, CAST({ba} AS BIGINT) AS _ba,
                           CAST({bb} AS BIGINT) AS _bb
                    FROM {rel}),
        zz AS (SELECT *,
                      ({spread_sql('_ba')})
                      | (({spread_sql('_bb')}) << 1) AS zvalue
               FROM zb)
        SELECT CAST(zvalue // {slice_width} AS BIGINT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(CAST({col_a} AS BIGINT)) AS BIGINT) AS min_a,
               CAST(MAX(CAST({col_a} AS BIGINT)) AS BIGINT) AS max_a,
               CAST(MIN(CAST({col_b} AS BIGINT)) AS BIGINT) AS min_b,
               CAST(MAX(CAST({col_b} AS BIGINT)) AS BIGINT) AS max_b
        FROM zz
        GROUP BY 1"""
