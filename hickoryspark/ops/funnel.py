"""Ordered funnel analysis over the events table.

The product-analytics staple: how many users progressed
view → click → purchase, in ORDER, and when. Strict-order,
earliest-completion semantics — the deterministic variant every SQL
funnel tutorial converges on, pinned here so the DuckDB mirror is
exact.

Pinned semantics:

- stage 1 time ``t1`` = the user's MIN timestamp of the first step
  type; stage k time ``tk`` = the MIN timestamp of the k-th step
  type STRICTLY AFTER ``t(k-1)`` (one event cannot serve two stages,
  and an equal-timestamp event does not chain);
- output: one row per user who reached stage 1 —
  ``(user_id, n_stages, stage1_ts .. stageK_ts)`` with the pinned
  6-digit string render (ops/asof.TS_FMT) and NULL for unreached
  stages; ``n_stages`` is BIGINT.

Scale shape: k-1 chained (filter → equi-join on user → min-agg)
rounds, all shuffling on the same user key (AQE reuses the
partitioning; k is a small constant). No windows over the full event
stream, no per-user collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.asof import TS_FMT

__all__ = ["funnel_stages"]


def funnel_stages(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """See module docstring; ``steps`` must be non-empty."""
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = events.where(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("_ts"))
        reached = (
            nxt.join(cur.select(user_col, f"_t{k - 1}"), user_col)
            .where(F.col("_ts") > F.col(f"_t{k - 1}"))
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"_t{k}"))
        )
        cur = cur.join(reached, user_col, "left")
    n_stages = sum(
        (F.col(f"_t{k}").isNotNull().cast("long")
         for k in range(1, len(steps) + 1)),
        F.lit(0).cast("long"),
    )
    return cur.select(
        user_col,
        n_stages.alias("n_stages"),
        *[
            F.date_format(f"_t{k}", TS_FMT).alias(f"stage{k}_ts")
            for k in range(1, len(steps) + 1)
        ],
    )
