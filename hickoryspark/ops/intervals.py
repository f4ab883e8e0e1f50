"""Range (interval-containment) join.

The second temporal-join primitive Spark lacks as a builtin
(ops/asof.py is the first): match point events into keyed time
intervals — fetches into crawl sessions, errors into deploy windows,
events into ad campaigns. A naive formulation is a per-key cross
product with a range predicate (Spark plans BroadcastNestedLoop or
an exploded sort-merge); the scalable shape is BUCKETIZED: quantize
time into fixed buckets, equi-join on (key, bucket), and keep the
range predicate as a cheap residual — the standard distributed
range-join decomposition (Spark's own storage-partitioned range
join and DuckDB's IEJoin papers both reduce to it).

Pinned semantics:

- intervals are half-open ``[start, end)``; a point matches iff
  ``start <= pt < end``; empty/negative intervals (end <= start)
  match nothing;
- one output row per (point, containing interval) — a point in two
  overlapping intervals matches both; exactly once each (a point
  lives in ONE bucket, an interval is exploded to every bucket it
  covers, so the equi-join meets each pair exactly once — no
  distinct needed);
- intervals covering more than ``max_buckets`` buckets are DROPPED
  (the hostile-input cap discipline: one year-long interval at
  1-minute buckets would explode 525k rows; size ``bucket_seconds``
  to the data instead — documented, unit-pinned);
- timestamps are compared as epoch microseconds obtained via a
  TIMESTAMP cast on both operands — the session offset cancels, so
  NTZ inputs are safe (the asof_join discipline).

Scale shape: one explode (bounded by max_buckets), one equi-join on
(keys, bucket) — broadcastable when either side is small, AQE-safe
otherwise. No window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _micros(c) -> "F.Column":
    return F.unix_micros(c.cast("timestamp"))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: tuple = ("user_id",),
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
    max_buckets: int = 10000,
    prefix: str = "iv_",
) -> DataFrame:
    """All ``points`` columns plus every non-key ``intervals`` column
    prefixed with ``prefix`` — inner join on containment."""
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    keys = list(keys)
    bm = bucket_seconds * 1_000_000

    s = _micros(F.col(start_col))
    e = _micros(F.col(end_col))
    bs = F.floor(s / bm)
    be = F.floor((e - 1) / bm)  # end exclusive: last covered bucket
    iv_cols = [c for c in intervals.columns if c not in keys]
    iv = (
        intervals.where(F.col(end_col) > F.col(start_col))
        .where(be - bs < max_buckets)
        .select(
            *keys,
            F.explode(F.sequence(bs, be)).alias("_bkt"),
            s.alias("_s"),
            e.alias("_e"),
            *[F.col(c).alias(f"{prefix}{c}") for c in iv_cols],
        )
    )
    pt = points.select(
        "*",
        F.floor(_micros(F.col(point_ts)) / bm).alias("_bkt"),
        _micros(F.col(point_ts)).alias("_pt"),
    )
    joined = pt.join(iv, keys + ["_bkt"]).where(
        (F.col("_s") <= F.col("_pt")) & (F.col("_pt") < F.col("_e"))
    )
    return joined.drop("_bkt", "_pt", "_s", "_e")
