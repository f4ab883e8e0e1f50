"""Event seasonality profile — hour-of-day / day-of-week shares.

The crawl-operations read on an event stream: fetch/error volume by
hour and weekday drives politeness windows and anomaly baselines
(a weekday-flat, hour-flat profile is bot traffic — humans have a
diurnal curve; ops/botdetect.py flags per-user regularity, this is
the population-level rollup it calibrates against).

Pinned NTZ-pure calendar arithmetic (the events_windowed lesson —
never unix_timestamp on TIMESTAMP_NTZ):

- ``hour`` = the NTZ timestamp's hour 0-23 (both engines' ``hour``
  reads the civil clock field);
- ``dow`` = ISO weekday 1-7 Monday-Sunday — computed from the DATE's
  proleptic day number, NOT the engines' dayofweek functions (Spark
  counts 1=Sunday, DuckDB 0=Sunday; a day-number modulus is
  convention-free): ``pmod(datediff(date, 2024-01-01), 7) + 1``
  with 2024-01-01 a Monday;
- shares in exact milli of the total event count.

Scale shape: one groupBy on (hour, dow) — 168 output rows regardless
of input size, map-side combinable — plus a broadcast 1-row total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["event_seasonality", "duckdb_seasonality_sql"]

#: a known Monday, anchoring the convention-free weekday index
_MONDAY = "2024-01-01"


def event_seasonality(events: DataFrame,
                      ts_col: str = "ts") -> DataFrame:
    """events → ``(hour, dow, n_events, share_milli)`` (≤168 rows;
    NULL timestamps drop)."""
    dow = (
        F.pmod(F.datediff(F.col(ts_col).cast("date"),
                          F.lit(_MONDAY).cast("date")), F.lit(7)) + 1
    ).cast("long")
    counts = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(F.hour(ts_col).cast("long").alias("hour"),
                 dow.alias("dow"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    total = counts.agg(F.sum("n_events").alias("_tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "hour", "dow", "n_events",
            F.expr("(1000 * n_events) div _tot").cast("long")
            .alias("share_milli"),
        )
    )


def duckdb_seasonality_sql(events_rel: str, ts: str = "ts") -> str:
    """DuckDB mirror of :func:`event_seasonality`."""
    return f"""
        WITH se_c AS (
          SELECT CAST(hour({ts}) AS BIGINT) AS hour,
                 CAST(((CAST({ts} AS DATE) - DATE '{_MONDAY}') % 7
                       + 7) % 7 + 1 AS BIGINT) AS dow,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM {events_rel} WHERE {ts} IS NOT NULL
          GROUP BY 1, 2
        ), se_t AS (SELECT SUM(n_events) AS tot FROM se_c)
        SELECT hour, dow, n_events,
               CAST((1000 * n_events) // tot AS BIGINT)
                 AS share_milli
        FROM se_c, se_t"""
