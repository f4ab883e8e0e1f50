"""A/B experiment readout — deterministic assignment + conversion.

The events-side companion to the retention cohort table: split users
into two arms by a deterministic hash of their id, measure a
conversion event in each arm, and report the rates side by side.
Used here the way crawl/corpus pipelines actually use it — comparing
a pipeline variant's effect on a downstream funnel — with the
repo's exact-integer discipline:

- arm = ``pmod(user_id, 2)`` → 'A' (0) / 'B' (1) — deterministic and
  engine-identical INCLUDING negative ids: Spark's ``pmod`` is
  non-negative while DuckDB's ``%`` is a truncated remainder (-3 % 2
  = -1), so the mirror spells pmod as ``((u % 2) + 2) % 2`` — a bare
  ``%`` would drop negative-id users from BOTH arm sums;
- a user converts iff they have >= 1 event of ``convert_type``;
- rates in exact milli: ``cvr_milli = (1000 * n_converted) div
  n_users``;
- the arm comparison is a SUBTRACTION (``diff_milli``), not a ratio:
  a negative ratio numerator would hit the Spark-truncate vs
  DuckDB-floor integer-division divergence, while subtraction is
  exact and sign-safe.

Output is ONE row — the experiment dashboard line. Scale shape: one
per-user aggregation (map-side combinable), one tiny arm rollup, one
conditional-sum pivot; no windows, no joins."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ab_conversion", "duckdb_ab_sql"]


def ab_conversion(events: DataFrame, convert_type: str = "purchase",
                  user_col: str = "user_id",
                  type_col: str = "event_type") -> DataFrame:
    """events → one row ``(n_a, conv_a, cvr_a_milli, n_b, conv_b,
    cvr_b_milli, diff_milli)``."""
    users = (
        events.where(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.max((F.col(type_col) == convert_type).cast("long"))
             .alias("_conv"))
        .select(F.pmod(F.col("_u"), F.lit(2)).alias("_arm"), "_conv")
    )
    row = users.agg(
        F.sum((F.col("_arm") == 0).cast("long")).cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("_arm") == 0, F.col("_conv"))
              .otherwise(F.lit(0))).cast("long").alias("conv_a"),
        F.sum((F.col("_arm") == 1).cast("long")).cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("_arm") == 1, F.col("_conv"))
              .otherwise(F.lit(0))).cast("long").alias("conv_b"),
    )
    return row.select(
        "n_a", "conv_a",
        F.expr("(1000 * conv_a) div greatest(n_a, 1)").cast("long")
        .alias("cvr_a_milli"),
        "n_b", "conv_b",
        F.expr("(1000 * conv_b) div greatest(n_b, 1)").cast("long")
        .alias("cvr_b_milli"),
        F.expr("(1000 * conv_b) div greatest(n_b, 1)"
               " - (1000 * conv_a) div greatest(n_a, 1)")
        .cast("long").alias("diff_milli"),
    )


def duckdb_ab_sql(events_rel: str, convert_type: str = "purchase",
                  user: str = "user_id",
                  type_col: str = "event_type") -> str:
    """DuckDB mirror of :func:`ab_conversion`."""
    return f"""
        WITH ab_u AS (
          SELECT (({user} % 2) + 2) % 2 AS arm,
                 MAX(CASE WHEN {type_col} = '{convert_type}'
                          THEN 1 ELSE 0 END) AS conv
          FROM {events_rel} WHERE {user} IS NOT NULL
          GROUP BY {user}
        ), ab_r AS (
          SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                      AS BIGINT) AS conv_a,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_b,
                 CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                      AS BIGINT) AS conv_b
          FROM ab_u)
        SELECT n_a, conv_a,
               CAST((1000 * conv_a) // GREATEST(n_a, 1) AS BIGINT)
                 AS cvr_a_milli,
               n_b, conv_b,
               CAST((1000 * conv_b) // GREATEST(n_b, 1) AS BIGINT)
                 AS cvr_b_milli,
               CAST((1000 * conv_b) // GREATEST(n_b, 1)
                    - (1000 * conv_a) // GREATEST(n_a, 1) AS BIGINT)
                 AS diff_milli
        FROM ab_r"""
