"""Bot / automation detection on event streams — inter-arrival
regularity.

Human click streams have ragged timing; schedulers, scrapers and
replay scripts fire on fixed intervals. The classic signal is the
longest run of IDENTICAL inter-arrival gaps per user: a cron-driven
client produces gap runs covering most of its history, a human
almost never repeats an exact microsecond gap twice.

Pinned semantics (exact-integer, NTZ-pure):

- events order per user by ``(ts, event_id)`` (the id breaks ties
  deterministically);
- ``gap`` = microseconds between consecutive events via
  ``timestampdiff(MICROSECOND, …)`` — NTZ-pure on both engines
  (never ``unix_timestamp``, which is tz-dependent on NTZ — the r4
  events lesson);
- ``max_gap_run`` = length of the longest run of consecutive EQUAL
  gaps (a user with g gaps and all equal scores g);
- ``regular_milli`` = 1000·max_gap_run div n_gaps (0 when no gaps);
  ``flagged`` = 1 iff n_gaps ≥ 5 and regular_milli ≥ 800 — the
  pinned decision rule.

Scale shape: ONE user-keyed shuffle; the lag/run-segment/rollup
windows all share the ``(user_id × ts-order)`` partitioning, so
Catalyst plans a single exchange + sorted window chain, then one
groupBy on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bot_signals", "duckdb_bot_signals_sql"]


def bot_signals(events: DataFrame) -> DataFrame:
    """events(user_id, ts, event_id, event_type) → per-user
    ``(user_id, n_events, n_types, n_gaps, max_gap_run,
    regular_milli, flagged)``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.expr("timestampdiff(MICROSECOND, "
               "lag(ts) over (partition by user_id "
               "order by ts, event_id), ts)").alias("gap"),
    )
    # run segmentation: a new segment starts when the gap differs
    # from the previous gap (null-safe — the first gap starts seg 1)
    prev_gap = F.lag("gap").over(w)
    gapped = gapped.withColumn(
        "new_seg",
        (~F.col("gap").eqNullSafe(prev_gap)).cast("int"))
    gapped = gapped.withColumn(
        "seg", F.sum("new_seg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    runs = (
        gapped.where(F.col("gap").isNotNull())
        .groupBy("user_id", "seg")
        .agg(F.count(F.lit(1)).cast("long").alias("run_len"))
        .groupBy("user_id")
        .agg(F.max("run_len").alias("max_gap_run"),
             F.sum("run_len").cast("long").alias("n_gaps"))
    )
    base = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count_distinct("event_type").cast("long").alias("n_types"),
    )
    out = base.join(runs, "user_id", "left").select(
        "user_id", "n_events", "n_types",
        F.coalesce("n_gaps", F.lit(0)).cast("long").alias("n_gaps"),
        F.coalesce("max_gap_run", F.lit(0)).cast("long")
        .alias("max_gap_run"),
    )
    reg = F.when(
        F.col("n_gaps") > 0,
        F.expr("1000 * max_gap_run div n_gaps")).otherwise(F.lit(0))
    return out.select(
        "*", reg.cast("long").alias("regular_milli"),
    ).select(
        "*",
        ((F.col("n_gaps") >= 5) & (F.col("regular_milli") >= 800))
        .cast("long").alias("flagged"),
    )


def duckdb_bot_signals_sql(events_rel: str) -> str:
    """DuckDB mirror (same ordering, run segmentation, rule)."""
    return f"""
        WITH bt_g AS (
          SELECT user_id, ts, event_id,
                 date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id), ts) AS gap
          FROM {events_rel}
        ), bt_n AS (
          SELECT user_id, ts, event_id, gap,
                 CASE WHEN gap IS DISTINCT FROM
                   lag(gap) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
                   THEN 1 ELSE 0 END AS new_seg
          FROM bt_g
        ), bt_s AS (
          SELECT user_id, gap,
                 SUM(new_seg) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS seg
          FROM bt_n
        ), bt_r AS (
          SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS max_gap_run,
                 CAST(SUM(run_len) AS BIGINT) AS n_gaps
          FROM (SELECT user_id, seg, COUNT(*) AS run_len
                FROM bt_s WHERE gap IS NOT NULL
                GROUP BY user_id, seg)
          GROUP BY user_id
        ), bt_b AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
          FROM {events_rel} GROUP BY user_id
        )
        SELECT b.user_id, b.n_events, b.n_types,
               CAST(COALESCE(r.n_gaps, 0) AS BIGINT) AS n_gaps,
               CAST(COALESCE(r.max_gap_run, 0) AS BIGINT)
                   AS max_gap_run,
               CAST(CASE WHEN COALESCE(r.n_gaps, 0) > 0
                         THEN 1000 * r.max_gap_run // r.n_gaps
                         ELSE 0 END AS BIGINT) AS regular_milli,
               CAST(CASE WHEN COALESCE(r.n_gaps, 0) >= 5
                          AND (CASE WHEN COALESCE(r.n_gaps, 0) > 0
                               THEN 1000 * r.max_gap_run // r.n_gaps
                               ELSE 0 END) >= 800
                         THEN 1 ELSE 0 END AS BIGINT) AS flagged
        FROM bt_b b LEFT JOIN bt_r r USING (user_id)"""
